"""Hard-negative mining for contrastive / metric training.

Uniform negatives (ml/negative_sampling.py) are cheap but mostly easy;
contrastive objectives train fastest on HARD negatives — the vectors
most similar to the anchor while carrying a DIFFERENT label, exactly
the pairs a model currently confuses. This is ann_cosine_topk's
broadcast-query scan plus one label-mismatch predicate: per anchor,
rank all differently-labeled vectors by exact cosine and keep the top
HARD_K.

Scale notes (100 TB): identical cost shape to the brute-force ANN
baseline — the anchor set is broadcast (tiny by construction), the
corpus streams through one scan, per-pair work is one O(dim) fold on
precomputed norms, and the per-anchor top-k is a WindowGroupLimit.
For an all-anchors mining pass you run it through the IVF path
(similarity/ivf.py): probe each anchor's nearest cells, filter
label-mismatch inside the probed cells only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.rounding import round_to, sql_round
from ..plans.registry import query
from ..sources import load
from .cosine import SQL_COS, N_QUERIES, as_double, dot

HARD_K = 5


@query(
    "hard_negative_mining",
    oracle=f"""
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS q_id, label AS q_label, v AS qv
      FROM e WHERE vec_id < {N_QUERIES}),
p AS (
  SELECT q.q_id, CAST(q.q_label AS BIGINT) AS anchor_label,
         e.vec_id, CAST(e.label AS BIGINT) AS neighbor_label,
         {sql_round(SQL_COS.format(a="q.qv", b="e.v"), 4)} AS sim
  FROM q, e
  WHERE e.vec_id <> q.q_id AND e.label <> q.q_label
),
r AS (
  SELECT q_id, anchor_label, vec_id, neighbor_label, sim,
         CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id)
              AS BIGINT) AS rn
  FROM p
)
SELECT q_id, anchor_label, vec_id AS neighbor_id, neighbor_label, sim, rn
FROM r WHERE rn <= {HARD_K}
""",
    tags=("similarity", "ann", "ML13"),
)
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{HARD_K} hardest negatives (most-similar, different-label
    vectors) for each of the first {N_QUERIES} anchors — exact cosine
    on precomputed norms, rounded sim + vec_id tie-break so the
    ranking is deterministic on every engine."""
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("label").cast("bigint").alias("label"),
        as_double(F.col("embedding")).alias("v"),
    )
    e = e.select(
        "vec_id", "label", "v", F.sqrt(dot(F.col("v"), F.col("v"))).alias("nrm")
    )
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("label").alias("anchor_label"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"),
    )
    pairs = e.join(
        F.broadcast(q),
        (F.col("vec_id") != F.col("q_id")) & (F.col("label") != F.col("anchor_label")),
    )
    sim = dot(F.col("qv"), F.col("v")) / (F.col("qnrm") * F.col("nrm"))
    scored = pairs.select(
        "q_id",
        "anchor_label",
        "vec_id",
        F.col("label").alias("neighbor_label"),
        round_to(sim, 4).alias("sim"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= HARD_K)
        .select(
            "q_id",
            "anchor_label",
            F.col("vec_id").alias("neighbor_id"),
            "neighbor_label",
            "sim",
            "rn",
        )
    )
