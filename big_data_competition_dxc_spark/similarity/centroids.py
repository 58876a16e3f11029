"""Per-label embedding centroid statistics — exact fixed-point, so an
"embedding analytics" aggregate carries a full cross-engine oracle.

The quality metric a clustering/labeling pipeline monitors per class:
the MEAN RESULTANT LENGTH R = ||Σv|| / Σ||v|| (directional-statistics
coherence: 1.0 = all vectors aligned, →0 = directions cancel), plus
the centroid norm ||Σv||/n. Float vector sums are order-dependent in
the last ulp (the reason most engines call such metrics
unreproducible); here every accumulation is EXACT INTEGER arithmetic:

- each component is fixed to micro-units once: u = floor(x * 1e6)
  (float→double widening is exact; floor is deterministic);
- per-vector squared norm q_v = Σ_d u² — a row-local index-order fold
  (≤ 9e12 per term, 64 dims → well inside BIGINT);
- per-(label, dim) component sums sd = Σ u — exact BIGINT;
- ||Σv||² = Σ_d sd² in 128-bit (Spark DECIMAL(38,0) / DuckDB HUGEINT:
  sd² alone can reach ~1e19, past int64);
- the ONLY float ops are two final sqrts and divides per label, on
  integers both engines round to the identical double, then rounded to
  4dp — far above ulp noise.

Scale notes (100 TB): posexplode is linear in n_vecs × dims with a
map-side-combinable (label, dim) aggregate — dims is a constant (64),
so state is |labels| × dims rows; the per-vector fold never leaves the
row. This is the same partial-aggregation shape as any SUM — no
all-pairs, no driver math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import round_to, sql_round
from ..plans.registry import query
from ..sources import load

UNITS = 1_000_000


@query(
    "embedding_label_centroids",
    oracle=f"""
WITH u AS (
  SELECT label, vec_id,
         unnest(list_transform(embedding, (x, i) -> {{
           'i': i,
           'u': CAST(floor(CAST(x AS DOUBLE) * {UNITS}) AS BIGINT)
         }})) AS s
  FROM embeddings
),
per_vec AS (
  SELECT label, vec_id, SUM(s.u * s.u) AS qv
  FROM u GROUP BY label, vec_id
),
vec_norms AS (
  SELECT label,
         COUNT(*) AS n_vecs,
         SUM(CAST(floor(sqrt(CAST(qv AS DOUBLE))) AS BIGINT)) AS sum_norm_u
  FROM per_vec GROUP BY label
),
per_dim AS (
  SELECT label, s.i AS d, SUM(s.u) AS sd
  FROM u GROUP BY label, s.i
),
centroid AS (
  SELECT label, SUM(CAST(sd AS HUGEINT) * sd) AS q FROM per_dim GROUP BY label
)
SELECT v.label,
       CAST(v.n_vecs AS BIGINT) AS n_vecs,
       {sql_round(f"v.sum_norm_u / {UNITS}.0 / v.n_vecs", 4)} AS avg_norm,
       {sql_round(f"sqrt(CAST(c.q AS DOUBLE)) / {UNITS}.0 / v.n_vecs", 4)}
         AS centroid_norm,
       {sql_round("sqrt(CAST(c.q AS DOUBLE)) / v.sum_norm_u", 4)}
         AS coherence
FROM vec_norms v JOIN centroid c ON c.label = v.label
""",
    tags=("similarity", "A9", "A4"),
)
def embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per label: vector count, mean vector norm, centroid norm
    ||Σv||/n (micro-unit exact), and coherence R = ||Σv|| / Σ||v|| —
    the per-class alignment monitor, bit-identical cross-engine by
    exact integer accumulation. (On unit-normalized embeddings
    avg_norm ≈ 1 and the last two columns coincide — avg_norm is
    published so that reading is self-evident.)"""
    emb = load(spark, sf_dir, "embeddings")
    units = emb.select(
        "label",
        "vec_id",
        F.expr(
            f"transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * {UNITS}) "
            f"AS BIGINT))"
        ).alias("us"),
    )
    # row-local exact fold: per-vector squared norm in unit^2
    per_vec = units.select(
        "label",
        "vec_id",
        "us",
        F.expr("aggregate(us, CAST(0 AS BIGINT), (acc, u) -> acc + u * u)").alias(
            "qv"
        ),
    )
    vec_norms = per_vec.groupBy("label").agg(
        F.count("*").alias("n_vecs"),
        F.sum(F.floor(F.sqrt(F.col("qv").cast("double"))).cast("bigint")).alias(
            "sum_norm_u"
        ),
    )
    per_dim = (
        per_vec.select("label", F.posexplode("us").alias("d", "u"))
        .groupBy("label", "d")
        .agg(F.sum("u").alias("sd"))
    )
    centroid = per_dim.groupBy("label").agg(
        F.sum(F.col("sd").cast("decimal(38,0)") * F.col("sd")).alias("q")
    )
    return vec_norms.join(centroid, "label").select(
        "label",
        F.col("n_vecs").cast("bigint").alias("n_vecs"),
        round_to(
            F.col("sum_norm_u") / F.lit(float(UNITS)) / F.col("n_vecs"), 4
        ).alias("avg_norm"),
        round_to(
            F.sqrt(F.col("q").cast("double")) / F.lit(float(UNITS)) / F.col("n_vecs"),
            4,
        ).alias("centroid_norm"),
        round_to(F.sqrt(F.col("q").cast("double")) / F.col("sum_norm_u"), 4).alias(
            "coherence"
        ),
    )
