"""Deterministic ranking evaluation (recall@K, MRR) of the item-CF
recommender on a hash-based holdout.

ML13's existing evaluations are MSE and set-intersection hit rate
(D:67-82, D:89-99); production recommenders are judged on RANKING
metrics. Both are computed here with zero RNG and zero floats:

- split: (user, item) pairs with md5(user:item) % 10 < 4 are held
  out (a 40% test split — the reference's randomSplit(0.6/0.4, seed)
  D:51, made engine-portable by hashing instead of seeding);
- model: the item-CF pipeline (ml/itemcf.py) built on the TRAIN split
  only, anti-joined against train so held-out items are
  recommendable;
- metrics per query user, in exact integer MICRO-units:
  recall@{{K}} = hits * 1e6 div |holdout|, and reciprocal rank
  = 1e6 div first-hit-rank (0 when no rec hits) — floor-div instead
  of float division, so the metric values hash-match cross-engine.

The whole evaluation — split, model, metrics — is one relational
pipeline with a full DuckDB oracle (the oracle recomputes the train
split and the capped/sims CTEs verbatim), which is rare for an "ML
metric" and exactly why the hash split exists.

Scale notes (100 TB): the split predicate is a narrow per-row hash
(no shuffle); model cost is the item-CF pipeline's (per-user pair cap
bounds the self-join); metrics add one broadcast-sized join of the
TOPK_RECS-per-user recommendation list against the holdout slice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import md5_bigint, sql_md5_bigint
from ..plans.registry import query
from .itemcf import _CAPPED_SQL, _SIMS_SQL, K_NEIGHBORS, MICRO, TOPK_RECS, _neighbors
from .recommend import _RATINGS_SQL, N_QUERY_USERS, ratings

HOLDOUT_MOD = 10
HOLDOUT_LT = 4  # 40% test, mirroring D:51's 60/40 split

_PAIR = "CAST(user_id AS VARCHAR) || ':' || CAST(item_id AS VARCHAR)"


@query(
    "itemcf_ranking_eval",
    oracle=f"""
WITH r0 AS ({_RATINGS_SQL}),
holdout AS (
  SELECT user_id, item_id FROM r0
  WHERE {sql_md5_bigint(_PAIR)} % {HOLDOUT_MOD} < {HOLDOUT_LT}
),
r AS (
  SELECT * FROM r0
  WHERE {sql_md5_bigint(_PAIR)} % {HOLDOUT_MOD} >= {HOLDOUT_LT}
),
capped AS ({_CAPPED_SQL}),
{_SIMS_SQL},
qusers AS (SELECT DISTINCT user_id FROM r WHERE user_id <= {N_QUERY_USERS}),
cand AS (
  SELECT q.user_id, n.j AS item_id, SUM(n.sim_u) AS score_u
  FROM qusers q
  JOIN capped c ON c.user_id = q.user_id
  JOIN neighbors n ON n.i = c.item_id AND n.rn <= {K_NEIGHBORS}
  WHERE NOT EXISTS (
    SELECT 1 FROM r rated
    WHERE rated.user_id = q.user_id AND rated.item_id = n.j
  )
  GROUP BY q.user_id, n.j
),
recs AS (
  SELECT user_id, item_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                 ORDER BY score_u DESC, item_id) AS BIGINT) AS rn
  FROM cand
),
topk AS (SELECT * FROM recs WHERE rn <= {TOPK_RECS}),
hits AS (
  SELECT t.user_id, t.rn
  FROM topk t JOIN holdout h
    ON h.user_id = t.user_id AND h.item_id = t.item_id
),
per_user AS (
  SELECT q.user_id,
         (SELECT COUNT(*) FROM holdout h WHERE h.user_id = q.user_id) AS n_holdout,
         (SELECT COUNT(*) FROM hits x WHERE x.user_id = q.user_id) AS n_hits,
         (SELECT MIN(rn) FROM hits x WHERE x.user_id = q.user_id) AS first_hit
  FROM qusers q
)
SELECT user_id,
       CAST(n_holdout AS BIGINT) AS n_holdout,
       CAST(n_hits AS BIGINT) AS n_hits,
       CAST(CASE WHEN n_holdout = 0 THEN 0
                 ELSE (n_hits * {MICRO}) // n_holdout END AS BIGINT) AS recall_micro,
       CAST(CASE WHEN first_hit IS NULL THEN 0
                 ELSE {MICRO} // first_hit END AS BIGINT) AS rr_micro
FROM per_user
""",
    tags=("ML13", "ML9", "U4", "J8"),
)
def itemcf_ranking_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query-user recall@{TOPK_RECS} and reciprocal rank (exact
    integer micro-units) of item-CF recommendations trained on the
    60% hash-split, judged against the 40% holdout."""
    r0 = ratings(spark, sf_dir)
    bucket = (
        md5_bigint(
            F.concat(
                F.col("user_id").cast("string"),
                F.lit(":"),
                F.col("item_id").cast("string"),
            ),
            15,
        )
        % HOLDOUT_MOD
    )
    holdout = r0.filter(bucket < HOLDOUT_LT).select("user_id", "item_id")
    train = r0.filter(bucket >= HOLDOUT_LT)

    qusers = (
        train.select("user_id").filter(F.col("user_id") <= N_QUERY_USERS).distinct()
    )
    from .itemcf import _capped

    qrated = _capped(spark, sf_dir, train).filter(
        F.col("user_id") <= N_QUERY_USERS
    )
    # neighbor lists are only read for the query users' capped train
    # items — prune the pair join to that focus set (see _neighbors)
    nb = _neighbors(
        spark, sf_dir, train, focus_items=qrated.select("item_id").distinct()
    ).filter(F.col("rn") <= K_NEIGHBORS)
    cand = (
        qrated.join(nb, qrated.item_id == nb.i)
        .select("user_id", F.col("j").alias("cand_item"), "sim_u")
        .join(
            train.select(F.col("user_id").alias("ru"), F.col("item_id").alias("ri")),
            (F.col("user_id") == F.col("ru")) & (F.col("cand_item") == F.col("ri")),
            "left_anti",
        )
        .groupBy("user_id", F.col("cand_item").alias("item_id"))
        .agg(F.sum("sim_u").alias("score_u"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.col("score_u").desc(), F.col("item_id"))
    topk = (
        cand.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= TOPK_RECS)
        .select("user_id", "item_id", "rn")
    )
    hits = topk.join(holdout, ["user_id", "item_id"]).select("user_id", "rn")
    h_stats = holdout.groupBy("user_id").agg(F.count("*").alias("n_holdout"))
    hit_stats = hits.groupBy("user_id").agg(
        F.count("*").alias("n_hits"), F.min("rn").alias("first_hit")
    )
    return (
        qusers.join(h_stats, "user_id", "left")
        .join(hit_stats, "user_id", "left")
        .select(
            "user_id",
            F.coalesce("n_holdout", F.lit(0)).cast("bigint").alias("n_holdout"),
            F.coalesce("n_hits", F.lit(0)).cast("bigint").alias("n_hits"),
            F.when(F.coalesce("n_holdout", F.lit(0)) == 0, F.lit(0))
            .otherwise(F.expr(f"(coalesce(n_hits, 0) * {MICRO}) div n_holdout"))
            .cast("bigint")
            .alias("recall_micro"),
            F.when(F.col("first_hit").isNull(), F.lit(0))
            .otherwise(F.expr(f"{MICRO} div first_hit"))
            .cast("bigint")
            .alias("rr_micro"),
        )
    )
