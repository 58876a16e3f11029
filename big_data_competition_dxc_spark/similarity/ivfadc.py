"""IVFADC-style cell-probed quantized retrieval — the composed form of
the ANN ladder (coarse cells + quantized RESIDUALS + asymmetric
scoring + exact re-rank), made fully deterministic and oracle-paired.

The production IVFADC shape (Jégou et al. 2011 "Product Quantization
for Nearest Neighbor Search"; the coarse-quantize/residual-encode/
asymmetric-distance pipeline behind FAISS) uses KMeans coarse cells,
which no SQL oracle can replay. This query swaps in the tree's
deterministic coarse quantizer — sign-bit cells over the first
``IVF_BITS`` dimensions (same convention as SemDeDup's buckets,
semdedup.py) — and keeps everything else structurally faithful:

1. coarse assign: cell = sign-bit code of the vector (64 cells);
2. cell centroids: element-wise mean, accumulated in EXACT micro-unit
   integers (the centroids.py fixed-point argument — float sums are
   partition-order-dependent, integer sums are not), divided once;
3. residual encode: r = v − centroid(cell), symmetric int8 per vector
   (zero-residual singleton cells guarded to all-zero codes);
4. probe: each query scans its own cell plus the six Hamming-1
   neighbors — 7 of 64 cells, ~11% of the corpus, never all of it;
5. asymmetric score (query stays full-precision):
   score ≈ ⟨q, centroid_cell⟩ + rscale·⟨q, int8-residual⟩, where the
   centroid term is computed ONCE per (query, probed cell) — 70 pairs
   — not per candidate;
6. exact cosine re-rank of the {SHORTLIST}-candidate shortlist only.

Cross-engine determinism: cells and centroid numerators are exact
integers; residuals/scales derive from identical IEEE expression
trees; the int8 residual dot is an exact integer under double
accumulation; rankings compare ROUNDED scores with vec_id tie-breaks.

Scale notes (100 TB): every join is a broadcast EQUI-join (cells and
probe pairs are tiny dimension tables; no BroadcastNestedLoopJoin —
the probe join on cell id replaces the brute pass's ``!=`` cross
form). The corpus is touched by: one linear cell/centroid aggregation
(map-side combinable, state = 64 cells × 64 dims), one linear residual
encode, and a probe join that reads only the probed cells' partitions;
full-precision vectors cross a join only for shortlist survivors.

No reference-repo counterpart (SURVEY §2 extension: similarity
family; the reference's retrieval is the ALS/ItemCF family, D:23-108).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import round_to, sql_round
from ..plans.registry import query
from ..sources import load
from .quantize import N_Q_QUERIES, Q_TOPK, QMAX, SHORTLIST

IVF_BITS = 6
C_UNITS = 1_000_000  # centroid-numerator fixed-point grid (micro-units)

#: Hamming-1 probe set: the cell itself plus each single-bit flip.
PROBE_OFFSETS = [0] + [1 << i for i in range(IVF_BITS)]

#: Identical sign-bit cell expression on both engines; {v} is a
#: DOUBLE array, {base} the first index (Spark arrays are 0-based,
#: DuckDB lists 1-based — the code value is the same either way).
def _cell_sql(v: str, base: int) -> str:
    terms = " + ".join(
        f"(CASE WHEN {v}[{base + i}] >= 0 THEN {1 << i} ELSE 0 END)"
        for i in range(IVF_BITS)
    )
    return f"CAST({terms} AS BIGINT)"


_COS = (
    "(list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))))"
)

_IVFADC_ORACLE = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
b AS (
  SELECT vec_id, v,
         sqrt(list_dot_product(v, v)) AS nrm,
         {_cell_sql("v", 1)} AS cell
  FROM e
),
u AS (
  SELECT cell, unnest(list_transform(v, (x, i) -> {{
           'i': i,
           'u': CAST(floor(x * {C_UNITS}.0) AS BIGINT)
         }})) AS s
  FROM b
),
cd AS (
  SELECT cell, s.i AS i, SUM(s.u) AS su, CAST(COUNT(*) AS BIGINT) AS n
  FROM u GROUP BY cell, s.i
),
cen AS (
  SELECT cell,
         list(CAST(su AS DOUBLE) / (CAST(n AS DOUBLE) * {C_UNITS}.0)
              ORDER BY i) AS c
  FROM cd GROUP BY cell
),
res AS (
  SELECT b.vec_id, b.nrm, b.cell,
         list_transform(b.v, (x, i) -> x - cen.c[i]) AS r
  FROM b JOIN cen USING (cell)
),
rs AS (
  SELECT vec_id, nrm, cell, r,
         list_max(list_transform(r, x -> abs(x))) / {QMAX}.0 AS rscale
  FROM res
),
z AS (
  SELECT vec_id, nrm, cell, rscale,
         CASE WHEN rscale = 0 THEN list_transform(r, x -> 0.0)
              ELSE list_transform(r, x -> floor(x / rscale + 0.5))
         END AS qr
  FROM rs
),
qs AS (
  SELECT vec_id AS q_id, v AS qv, nrm AS qnrm, cell AS qcell
  FROM b WHERE vec_id < {N_Q_QUERIES}
),
pr AS (
  SELECT qs.q_id, qs.qv, qs.qnrm, xor(qs.qcell, off.o) AS pcell
  FROM qs, (VALUES {", ".join(f"({o})" for o in PROBE_OFFSETS)}) off(o)
),
pc AS (
  SELECT pr.q_id, pr.qv, pr.qnrm, pr.pcell,
         list_dot_product(pr.qv, cen.c) AS qdotc
  FROM pr JOIN cen ON cen.cell = pr.pcell
),
cand AS (
  SELECT pc.q_id, z.vec_id,
         {sql_round(
             "((pc.qdotc + z.rscale * list_dot_product(pc.qv, z.qr))"
             " / (pc.qnrm * z.nrm))", 6)} AS qsim
  FROM pc JOIN z ON z.cell = pc.pcell AND z.vec_id <> pc.q_id
),
sl AS (
  SELECT q_id, vec_id, qsim,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY qsim DESC, vec_id)
           AS qrn
  FROM cand
),
short AS (SELECT q_id, vec_id, qsim FROM sl WHERE qrn <= {SHORTLIST}),
rr AS (
  SELECT short.q_id, short.vec_id, short.qsim,
         {sql_round(_COS.format(a="sq.v", b="sc.v"), 4)} AS sim
  FROM short
  JOIN b sq ON sq.vec_id = short.q_id
  JOIN b sc ON sc.vec_id = short.vec_id
)
SELECT q_id, vec_id AS neighbor_id, qsim, sim,
       CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id)
            AS BIGINT) AS rn
FROM rr
QUALIFY rn <= {Q_TOPK}
"""


@query(
    "ann_ivfadc_topk",
    oracle=_IVFADC_ORACLE,
    tags=("similarity", "ann", "quantize"),
)
def ann_ivfadc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cell-probed quantized retrieval: sign-bit coarse cells,
    micro-unit-exact cell centroids, int8-quantized residuals,
    Hamming-1 probing (7 of {2**IVF_BITS} cells per query), asymmetric
    scoring with the centroid term hoisted to once per (query, cell),
    and exact-cosine re-rank of the {SHORTLIST}-candidate shortlist."""
    from pyspark.sql import Window

    def _dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    e = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("v"),
    )
    b = e.select(
        "vec_id",
        "v",
        F.sqrt(_dot(F.col("v"), F.col("v"))).alias("nrm"),
        F.expr(_cell_sql("v", 0)).alias("cell"),
    )

    # -- cell centroids: exact integer numerators, one division -------
    pe = b.select(
        "cell",
        F.posexplode(
            F.expr(
                f"transform(v, x -> CAST(floor(x * {C_UNITS}.0) AS BIGINT))"
            )
        ).alias("i", "u"),
    )
    cd = pe.groupBy("cell", "i").agg(
        F.sum("u").alias("su"), F.count("*").cast("bigint").alias("n")
    )
    cen = (
        cd.select(
            "cell",
            "i",
            (
                F.col("su").cast("double")
                / (F.col("n").cast("double") * F.lit(float(C_UNITS)))
            ).alias("ce"),
        )
        .groupBy("cell")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("i", "ce"))),
                lambda s: s.getField("ce"),
            ).alias("c")
        )
    )

    # -- residual encode (int8, zero-residual cells guarded) ----------
    res = b.join(F.broadcast(cen), "cell").select(
        "vec_id",
        "nrm",
        "cell",
        F.zip_with(F.col("v"), F.col("c"), lambda a, c: a - c).alias("r"),
    )
    rs = res.select(
        "vec_id",
        "nrm",
        "cell",
        "r",
        (F.array_max(F.transform(F.col("r"), F.abs)) / QMAX).alias("rscale"),
    )
    z = rs.select(
        "vec_id",
        "nrm",
        "cell",
        "rscale",
        F.when(
            F.col("rscale") == 0,
            F.transform(F.col("r"), lambda x: F.lit(0.0)),
        )
        .otherwise(
            F.transform(
                F.col("r"),
                lambda x: F.floor(x / F.col("rscale") + 0.5).cast("double"),
            )
        )
        .alias("qr"),
    )

    # -- probe pairs: query x (own cell + Hamming-1 flips) ------------
    qs = b.filter(F.col("vec_id") < N_Q_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"),
        F.col("cell").alias("qcell"),
    )
    pr = qs.select(
        "q_id",
        "qv",
        "qnrm",
        "qcell",
        F.explode(F.array(*[F.lit(o) for o in PROBE_OFFSETS])).alias("o"),
    ).select(
        "q_id", "qv", "qnrm", F.expr("qcell ^ o").alias("pcell")
    )
    pc = pr.join(
        F.broadcast(cen.withColumnRenamed("cell", "pcell")), "pcell"
    ).select(
        "q_id",
        "qv",
        "qnrm",
        "pcell",
        _dot(F.col("qv"), F.col("c")).alias("qdotc"),
    )

    # -- probed candidates, quantized asymmetric score ----------------
    cand = z.join(
        F.broadcast(pc),
        (F.col("cell") == F.col("pcell")) & (F.col("vec_id") != F.col("q_id")),
    ).select(
        "q_id",
        "vec_id",
        round_to(
            (F.col("qdotc") + F.col("rscale") * _dot(F.col("qv"), F.col("qr")))
            / (F.col("qnrm") * F.col("nrm")),
            6,
        ).alias("qsim"),
    )
    w_short = Window.partitionBy("q_id").orderBy(F.desc("qsim"), F.asc("vec_id"))
    short = (
        cand.withColumn("qrn", F.row_number().over(w_short))
        .filter(F.col("qrn") <= SHORTLIST)
        .select("q_id", "vec_id", "qsim")
    )

    # -- exact re-rank of the shortlist only --------------------------
    qv = b.filter(F.col("vec_id") < N_Q_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("v").alias("query_v"),
        F.col("nrm").alias("query_nrm"),
    )
    rr = (
        b.select("vec_id", "v", "nrm")
        .join(F.broadcast(short), "vec_id")
        .join(F.broadcast(qv), "q_id")
        .select(
            "q_id",
            "vec_id",
            "qsim",
            round_to(
                _dot(F.col("query_v"), F.col("v"))
                / (F.col("query_nrm") * F.col("nrm")),
                4,
            ).alias("sim"),
        )
    )
    w_final = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        rr.withColumn("rn", F.row_number().over(w_final).cast("bigint"))
        .filter(F.col("rn") <= Q_TOPK)
        .select("q_id", F.col("vec_id").alias("neighbor_id"), "qsim", "sim", "rn")
    )
