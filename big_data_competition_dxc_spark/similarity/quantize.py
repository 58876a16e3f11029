"""Embedding quantization: per-vector symmetric int8 with error audit.

Vector stores ship int8-quantized embeddings (4x smaller, SIMD
dot-products); the pipeline step is: per vector, scale =
max(|v|)/127, q_i = round(v_i/scale), and an audit of the
reconstruction error before the quantized corpus replaces the fp32
one.

Determinism across engines: every arithmetic step is IEEE double ops
in an identical expression tree (float32 inputs widen exactly), the
per-element squared error is converted to exact integer units
(floor(e*1e12+0.5)) BEFORE summation, and the sums are
DECIMAL(38,0) — so the hash-compared result is bit-identical
regardless of row order, partition layout, or engine (same
argument as functions/rounding.py's fixed_sum).

Scale notes (100 TB): per-vector work is explode -> narrow math ->
hash aggregate on vec_id; elements of a vector never leave their
input partition before the partial aggregate. No Python, no UDFs —
whole-stage codegen end to end.

No reference-repo counterpart (SURVEY §2 extension: similarity
family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import round_to, sql_round
from ..plans.registry import query
from ..sources import load

QMAX = 127
ERR_UNITS = 10**12  # squared-error fixed-point grid
SHORTLIST = 15  # quantized-score candidates per query before exact re-rank

_QUANT_ORACLE = f"""
WITH t AS (
  SELECT vec_id,
         list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))
           / {QMAX}.0 AS scale,
         embedding
  FROM embeddings
), e AS (
  SELECT vec_id, scale,
         CAST(unnest(embedding) AS DOUBLE) AS v
  FROM t
), q AS (
  SELECT vec_id, scale, v,
         floor(v / scale + 0.5) AS qv
  FROM e
)
SELECT vec_id,
       (floor(MAX(scale) * 1000000.0 + 0.5) / CAST(1000000.0 AS DOUBLE))
         AS scale,
       CAST(COUNT(*) AS BIGINT) AS dim,
       CAST(MAX(abs(qv)) AS BIGINT) AS q_absmax,
       CAST(SUM(CAST(floor((v - qv * scale) * (v - qv * scale)
                           * {ERR_UNITS}.0 + 0.5) AS DECIMAL(38,0)))
            AS BIGINT) AS sq_err_units
FROM q GROUP BY vec_id
"""


@query("embedding_quantize_int8", oracle=_QUANT_ORACLE, tags=("similarity", "quantize"))
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization audit: per vector, the scale, the
    realized |q|max (must be <= 127), and the total squared
    reconstruction error in exact 1e-12 fixed-point units. Explode +
    one hash aggregate on vec_id."""
    emb = load(spark, sf_dir, "embeddings")
    scale = (
        F.array_max(
            F.transform(F.col("embedding"), lambda x: F.abs(x.cast("double")))
        )
        / QMAX
    )
    e = emb.select(
        "vec_id",
        scale.alias("scale"),
        F.explode(F.col("embedding")).alias("raw"),
    ).select(
        "vec_id", "scale", F.col("raw").cast("double").alias("v")
    )
    qv = F.floor(F.col("v") / F.col("scale") + 0.5)
    err = F.col("v") - qv * F.col("scale")
    q = e.select(
        "vec_id",
        "scale",
        qv.alias("qv"),
        F.floor(err * err * F.lit(float(ERR_UNITS)) + 0.5)
        .cast("decimal(38,0)")
        .alias("sq_units"),
    )
    return q.groupBy("vec_id").agg(
        (F.floor(F.max("scale") * 1000000.0 + 0.5) / F.lit(1000000.0)).alias(
            "scale"
        ),
        F.count("*").alias("dim"),
        F.max(F.abs(F.col("qv"))).cast("bigint").alias("q_absmax"),
        F.sum("sq_units").cast("bigint").alias("sq_err_units"),
    )


# ---------------------------------------------------------------------------
# Quantized retrieval: int8 shortlist -> exact re-rank
# ---------------------------------------------------------------------------
#
# The serving-time payoff of the audit above: score candidates with the
# QUANTIZED arrays (4x less memory traffic, integer dot products), keep a
# small per-query shortlist, and spend full-precision arithmetic only on
# the shortlist (asymmetric shortlist-then-rerank as in IVFADC / ScaNN;
# Jegou et al. 2011, Guo et al. 2020). Determinism across engines: the
# quantized arrays hold integers <= 127, so a 64-dim dot product stays an
# exact integer under IEEE double accumulation on BOTH engines
# (list_dot_product / the zip_with fold); every scale/norm is derived
# from float32 inputs by the identical expression tree; rankings compare
# ROUNDED scores with vec_id tie-breaks.

N_Q_QUERIES = 10  # same bounded query-set convention as ann_cosine_topk
Q_TOPK = 5

_QSIM = "(((list_dot_product({qa}, {ca}) * {qs}) * {cs}) / ({qn} * {cn}))"
_COS = (
    "(list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))))"
)

_RERANK_ORACLE = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
s AS (
  SELECT vec_id, v,
         list_max(list_transform(v, x -> abs(x))) / {QMAX}.0 AS scale,
         sqrt(list_dot_product(v, v)) AS nrm
  FROM e
),
z AS (
  SELECT vec_id, scale, nrm,
         list_transform(v, x -> floor(x / scale + 0.5)) AS qa
  FROM s
),
qs AS (
  SELECT vec_id AS q_id, scale AS qscale, nrm AS qnrm, qa AS qqa
  FROM z WHERE vec_id < {N_Q_QUERIES}
),
p AS (
  SELECT qs.q_id, z.vec_id,
         {sql_round(_QSIM.format(qa="qs.qqa", ca="z.qa", qs="qs.qscale",
                                 cs="z.scale", qn="qs.qnrm", cn="z.nrm"), 6)}
           AS qsim
  FROM qs, z WHERE z.vec_id <> qs.q_id
),
sl AS (
  SELECT q_id, vec_id, qsim,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY qsim DESC, vec_id)
           AS qrn
  FROM p
),
short AS (SELECT q_id, vec_id, qsim FROM sl WHERE qrn <= {SHORTLIST}),
rr AS (
  SELECT short.q_id, short.vec_id, short.qsim,
         {sql_round(_COS.format(a="sq.v", b="sc.v"), 4)} AS sim
  FROM short
  JOIN s sq ON sq.vec_id = short.q_id
  JOIN s sc ON sc.vec_id = short.vec_id
)
SELECT q_id, vec_id AS neighbor_id, qsim, sim,
       CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id)
            AS BIGINT) AS rn
FROM rr
QUALIFY rn <= {Q_TOPK}
"""


@query(
    "ann_quantized_rerank",
    oracle=_RERANK_ORACLE,
    tags=("similarity", "ann", "quantize"),
)
def ann_quantized_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric quantized retrieval: shortlist {SHORTLIST} candidates
    per query by int8-quantized score, then exact-cosine re-rank ONLY
    the shortlist to top-{Q_TOPK}. The first pass touches nothing but
    the quantized arrays and two scalars per vector (the 100 TB win:
    ~4x less scan bandwidth and integer multiplies); full-precision
    vectors are re-fetched for shortlist rows only — {SHORTLIST} per
    query, not the corpus."""
    from pyspark.sql import Window

    e = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("v"),
    )

    def _dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    base = e.select(
        "vec_id",
        "v",
        (F.array_max(F.transform(F.col("v"), F.abs)) / QMAX).alias("scale"),
        F.sqrt(_dot(F.col("v"), F.col("v"))).alias("nrm"),
    )
    z = base.select(
        "vec_id",
        "scale",
        "nrm",
        F.transform(
            F.col("v"),
            lambda x: F.floor(x / F.col("scale") + 0.5).cast("double"),
        ).alias("qa"),
    )
    qz = z.filter(F.col("vec_id") < N_Q_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("scale").alias("qscale"),
        F.col("nrm").alias("qnrm"),
        F.col("qa").alias("qqa"),
    )
    qsim = (
        (_dot(F.col("qqa"), F.col("qa")) * F.col("qscale")) * F.col("scale")
    ) / (F.col("qnrm") * F.col("nrm"))
    pairs = z.join(F.broadcast(qz), F.col("vec_id") != F.col("q_id")).select(
        "q_id", "vec_id", round_to(qsim, 6).alias("qsim")
    )
    w_short = Window.partitionBy("q_id").orderBy(
        F.desc("qsim"), F.asc("vec_id")
    )
    short = (
        pairs.withColumn("qrn", F.row_number().over(w_short))
        .filter(F.col("qrn") <= SHORTLIST)
        .select("q_id", "vec_id", "qsim")
    )

    # Exact re-rank: full-precision vectors join ONLY the shortlist
    # (equi-joins — the broadcast sides are O(queries * shortlist)).
    qv = base.filter(F.col("vec_id") < N_Q_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("v").alias("query_v"),
        F.col("nrm").alias("query_nrm"),
    )
    rr = (
        base.select("vec_id", "v", "nrm")
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
