"""Item-based collaborative filtering (the item-item twin of ML9).

The reference's KNN recommender (豆瓣图书推荐.md D:7-21) is USER-based
cosine; production recommenders at catalog scale run the ITEM-based
variant (item-item similarity is amortizable: items churn slower than
users). Same relational substrate as ml/recommend.py — implicit binary
feedback from the ratings matrix, cosine over co-occurrence:

    sim(i, j) = |U_i ∩ U_j| / sqrt(|U_i| * |U_j|)

Determinism: co-counts and popularities are exact integers; the single
sqrt+divide happens once per pair, then the similarity is immediately
fixed to integer MICRO-units (floor(x*1e6 + 0.5) as BIGINT). Every
downstream aggregate (the recommendation score) sums those BIGINTs —
order-independent, bit-identical cross-engine — and divides back out
only for display.

Hot-USER cap (the item-item blowup mirror of recommend.py's hot-item
cap): a user who rated n items contributes O(n^2) item pairs, so only
each user's top-USER_ITEM_CAP items (rating DESC, item_id tie-break)
enter the pair join. The cap BINDS at fixture scale (mean items/user
~35 > 32) and the DuckDB oracle applies the identical cap, so the
capped semantics are verified, not a no-op.

Scale notes (100 TB): pair generation shuffles on user_id with bounded
O(cap^2) fanout per user; similarity aggregation shuffles on (i, j);
the neighbor top-k is a WindowGroupLimit (partial per-partition top-k
before the exchange). The recommend step joins the query users'
ratings against the K-pruned neighbor list — |queries| x cap x K rows,
never the full similarity matrix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.rounding import round_to, sql_round
from ..plans.checkpointing import result_checkpoint
from ..plans.registry import query
from .recommend import _RATINGS_SQL, cached_ratings

N_QUERY_USERS = 10
K_NEIGHBORS = 5
TOPK_RECS = 5
USER_ITEM_CAP = 32
MICRO = 1_000_000

_CAPPED_SQL = f"""
  SELECT user_id, item_id FROM (
    SELECT user_id, item_id,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY rating DESC, item_id) AS rn
    FROM r
  ) WHERE rn <= {USER_ITEM_CAP}
"""

_SIMS_SQL = f"""
  pop AS (SELECT item_id, COUNT(*) AS n FROM capped GROUP BY item_id),
  co AS (
    SELECT a.item_id AS i, b.item_id AS j, COUNT(*) AS c
    FROM capped a JOIN capped b
      ON a.user_id = b.user_id AND a.item_id <> b.item_id
    GROUP BY a.item_id, b.item_id
  ),
  sims AS (
    SELECT co.i, co.j,
           CAST(floor(co.c / sqrt(pi.n * pj.n) * {MICRO}.0 + 0.5) AS BIGINT) AS sim_u
    FROM co JOIN pop pi ON pi.item_id = co.i
            JOIN pop pj ON pj.item_id = co.j
  ),
  neighbors AS (
    SELECT i, j, sim_u,
           CAST(ROW_NUMBER() OVER (PARTITION BY i
                                   ORDER BY sim_u DESC, j) AS BIGINT) AS rn
    FROM sims
  )
"""


def _capped(
    spark: SparkSession, sf_dir: str, r: DataFrame | None = None
) -> DataFrame:
    if r is None:
        # canonical parameterless path rides the session memo (the
        # ratings join+groupBy is a 6M-row lineitem join at sf1 and
        # every itemcf query used to re-derive it 2-4x per run);
        # custom frames (ranking_eval's train split) stay un-memoized
        r = cached_ratings(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.col("rating").desc(), F.col("item_id"))
    return (
        r.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= USER_ITEM_CAP)
        .select("user_id", "item_id")
    )


def _neighbors(
    spark: SparkSession,
    sf_dir: str,
    r: DataFrame | None = None,
    capped: DataFrame | None = None,
    focus_items: DataFrame | None = None,
) -> DataFrame:
    """(i, j, sim_u, rn): micro-unit cosine similarity per ordered item
    pair, ranked per i. sim_u is BIGINT from the first moment — the
    one float op (sqrt+divide) happens exactly once per pair. Pass a
    ratings frame to build the model on a subset (train split), or a
    pre-materialized ``capped`` frame to share it across the caller's
    plan (the capped subtree feeds pop + both pair-join sides — four
    evaluations when left lazy).

    ``focus_items`` (a small item_id frame) prunes the pair join's
    LEFT side to the items whose neighbor lists the caller actually
    consumes — every registered query reads neighbors for a bounded
    focus set (top-10 items, or <=10 query users' <=CAP items), so the
    O(cap^2 x users) pair explosion shrinks to the focus items'
    co-rating rows (r10: the unrestricted sf1 pair stage was ~150M
    rows and 46s; the focused form is semantically identical —
    popularity stays global, rn per i is complete for every focus i).
    Pass None to materialize the full item-item model (the serving-
    time shape a warehouse would persist once per catalog refresh)."""
    if capped is None:
        capped = _capped(spark, sf_dir, r)
    pop = capped.groupBy("item_id").agg(F.count("*").alias("n"))
    a_side = capped
    if focus_items is not None:
        a_side = capped.join(F.broadcast(focus_items), "item_id", "left_semi")
    a = a_side.alias("a")
    b = capped.alias("b")
    co = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.item_id") != F.col("b.item_id")),
        )
        .groupBy(F.col("a.item_id").alias("i"), F.col("b.item_id").alias("j"))
        .agg(F.count("*").alias("c"))
    )
    sims = (
        co.join(pop.select(F.col("item_id").alias("i"), F.col("n").alias("ni")), "i")
        .join(pop.select(F.col("item_id").alias("j"), F.col("n").alias("nj")), "j")
        .select(
            "i",
            "j",
            F.floor(
                F.col("c") / F.sqrt(F.col("ni") * F.col("nj")) * F.lit(float(MICRO))
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("sim_u"),
        )
    )
    w = Window.partitionBy("i").orderBy(F.col("sim_u").desc(), F.col("j"))
    return sims.withColumn("rn", F.row_number().over(w).cast("bigint"))


@query(
    "itemcf_item_neighbors",
    oracle=f"""
WITH r AS ({_RATINGS_SQL}),
  capped AS ({_CAPPED_SQL}),
  {_SIMS_SQL},
  top_items AS (
    SELECT item_id FROM pop ORDER BY n DESC, item_id LIMIT {N_QUERY_USERS}
  )
SELECT n.i AS item_id, n.j AS neighbor_id,
       {sql_round(f"n.sim_u / {MICRO}.0", 6)} AS sim, n.rn
FROM neighbors n JOIN top_items t ON n.i = t.item_id
WHERE n.rn <= {K_NEIGHBORS}
""",
    tags=("ML9", "J2", "A1", "W4"),
)
def itemcf_item_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{K_NEIGHBORS} most-similar items for each of the
    {N_QUERY_USERS} most-popular items (popularity DESC, item_id
    tie-break — deterministic on every engine). The capped frame is
    materialized once (executor-side, audit-transparent) and shared by
    pop, top_items, and both sides of the pair join."""
    capped = result_checkpoint(_capped(spark, sf_dir))
    pop = capped.groupBy("item_id").agg(F.count("*").alias("n"))
    top_items = (
        pop.orderBy(F.col("n").desc(), F.col("item_id"))
        .limit(N_QUERY_USERS)
        .select("item_id")
    )
    nb = _neighbors(spark, sf_dir, capped=capped, focus_items=top_items).filter(
        F.col("rn") <= K_NEIGHBORS
    )
    return nb.join(
        F.broadcast(top_items), nb.i == top_items.item_id
    ).select(
        F.col("i").alias("item_id"),
        F.col("j").alias("neighbor_id"),
        round_to(F.col("sim_u") / F.lit(float(MICRO)), 6).alias("sim"),
        "rn",
    )


@query(
    "itemcf_user_recommend",
    oracle=f"""
WITH r AS ({_RATINGS_SQL}),
  capped AS ({_CAPPED_SQL}),
  {_SIMS_SQL},
  qusers AS (
    SELECT DISTINCT user_id FROM r WHERE user_id <= {N_QUERY_USERS}
  ),
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
  ranked AS (
    SELECT user_id, item_id, score_u,
           CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY score_u DESC, item_id) AS BIGINT) AS rn
    FROM cand
  )
SELECT user_id, item_id,
       {sql_round(f"score_u / {MICRO}.0", 6)} AS score, rn
FROM ranked WHERE rn <= {TOPK_RECS}
""",
    tags=("ML9", "ML13", "J8", "A1", "W4", "O3"),
)
def itemcf_user_recommend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-based top-{TOPK_RECS} recommendations for the query users:
    score(u, j) = sum of micro-unit similarities from u's (capped)
    items to their K-pruned neighbors j, excluding items u already
    rated (anti-join). BIGINT micro-unit sums keep the score exact and
    order-independent; ties break on item_id."""
    r = cached_ratings(spark, sf_dir)
    capped = result_checkpoint(_capped(spark, sf_dir))
    qratings = capped.filter(F.col("user_id") <= N_QUERY_USERS)
    # neighbor lists are only read for the query users' capped items
    focus = qratings.select("item_id").distinct()
    nb = _neighbors(spark, sf_dir, capped=capped, focus_items=focus).filter(
        F.col("rn") <= K_NEIGHBORS
    )
    cand = (
        qratings.join(nb, qratings.item_id == nb.i)
        .select("user_id", F.col("j").alias("cand_item"), "sim_u")
        .join(
            r.select(F.col("user_id").alias("ru"), F.col("item_id").alias("ri")),
            (F.col("user_id") == F.col("ru")) & (F.col("cand_item") == F.col("ri")),
            "left_anti",
        )
        .groupBy("user_id", F.col("cand_item").alias("item_id"))
        .agg(F.sum("sim_u").alias("score_u"))
    )
    w = Window.partitionBy("user_id").orderBy(F.col("score_u").desc(), F.col("item_id"))
    return (
        cand.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= TOPK_RECS)
        .select(
            "user_id",
            "item_id",
            round_to(F.col("score_u") / F.lit(float(MICRO)), 6).alias("score"),
            "rn",
        )
    )
