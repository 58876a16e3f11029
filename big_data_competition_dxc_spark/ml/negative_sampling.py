"""Deterministic negative sampling for implicit-feedback training.

Every pairwise recommender objective (BPR, sampled softmax, ALS with
implicit negatives) needs non-interacted (user, item) pairs. Random
sampling is irreproducible across engines and runs; this operator
draws the sample by HASH ORDER instead: all non-rated items of each
query user are ranked by md5(user || ':' || item) and the first
NEG_K are taken — distributionally uniform (md5 scrambles any item-id
structure), yet bit-reproducible on every engine, so the query carries
a full DuckDB oracle (same md5 builtin, same lexicographic order).

Scale notes (100 TB): the candidate space is |query users| x catalog,
generated as a broadcast nested-loop of the TINY query-user side
against the item list — bounded by construction here. For
ALL-users sampling you invert the shape: rank items per user with a
WindowGroupLimit over hash order (partial per-partition top-k before
any exchange) after an anti-join on the interaction table, never
materializing the full cross product. The anti-join side is the
interaction table — it shuffles on (user, item) exactly once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.registry import query
from .recommend import _RATINGS_SQL, N_QUERY_USERS, ratings

NEG_K = 10


@query(
    "negative_sample_pairs",
    oracle=f"""
WITH r AS ({_RATINGS_SQL}),
qusers AS (SELECT DISTINCT user_id FROM r WHERE user_id <= {N_QUERY_USERS}),
items AS (SELECT DISTINCT item_id FROM r),
cand AS (
  SELECT q.user_id, i.item_id,
         md5(CAST(q.user_id AS VARCHAR) || ':' || CAST(i.item_id AS VARCHAR)) AS h
  FROM qusers q CROSS JOIN items i
  WHERE NOT EXISTS (
    SELECT 1 FROM r WHERE r.user_id = q.user_id AND r.item_id = i.item_id
  )
),
ranked AS (
  SELECT user_id, item_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                 ORDER BY h, item_id) AS BIGINT) AS neg_rank
  FROM cand
)
SELECT user_id, item_id, neg_rank FROM ranked WHERE neg_rank <= {NEG_K}
""",
    tags=("ML8", "J8", "U4", "W4"),
)
def negative_sample_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{NEG_K} deterministic hash-ordered negative items per query
    user: non-rated items ranked by md5(user:item) — uniform-but-
    reproducible, the property a training pipeline needs for exact
    re-runs and cross-engine verification."""
    r = ratings(spark, sf_dir)
    qusers = r.select("user_id").filter(F.col("user_id") <= N_QUERY_USERS).distinct()
    items = r.select("item_id").distinct()
    cand = (
        items.join(F.broadcast(qusers))  # tiny side broadcast, bounded fanout
        .join(r.select("user_id", "item_id"), ["user_id", "item_id"], "left_anti")
        .withColumn(
            "h",
            F.md5(
                F.concat(
                    F.col("user_id").cast("string"),
                    F.lit(":"),
                    F.col("item_id").cast("string"),
                )
            ),
        )
    )
    w = Window.partitionBy("user_id").orderBy("h", "item_id")
    return (
        cand.withColumn("neg_rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("neg_rank") <= NEG_K)
        .select("user_id", "item_id", "neg_rank")
    )
