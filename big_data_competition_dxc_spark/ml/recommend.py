"""Recommender pipelines (SURVEY §2.10 ML8, ML9; 豆瓣图书推荐.md).

The reference's ratings table is (user, book, rating) triples (D:5,
D:31-39). Our fixture equivalent: customer x part purchase intensity
derived from orders ⨝ lineitem — rating = quantity bucketed to 1..5,
integer-valued so every aggregate below is EXACT in IEEE doubles
(cross-engine-deterministic before rounding).

ML8 (D:23-108): pyspark.ml ALS replacing MLlib ALS.train — rank 10,
regParam 0.01 (D:62-64), randomSplit 60/40 seed 11 (D:51), test MSE
(D:67-82) and the hit-rate evaluation via top-k ∩ held-out (D:89-99),
excluding already-rated items (anti-join, D:21). Rows-only check.

ML9 (D:7-21, prose): user-based KNN cosine recommender, implemented
sparse: cosine via a shared-item self-join + exact integer dot
products — pure relational algebra, so BOTH queries carry full DuckDB
oracles (rare for "ML": this one is SQL-expressible).

Scale notes: the ratings self-join shuffles on item id — at 100 TB the
item-grouped pair generation is the classic bottleneck; cap per-item
fanout (popular items contribute O(n_i^2) pairs) or LSH-prune as in
similarity/cosine.py. ALS itself is driver-orchestrated alternating
sweeps in the JVM; the ratings frame shuffles once per side per sweep.
"""

from __future__ import annotations

from pyspark.ml.evaluation import RegressionEvaluator
from pyspark.ml.recommendation import ALS
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.rounding import (
    fixed_avg,
    fixed_sum,
    round_to,
    sql_fixed_avg,
    sql_fixed_sum,
    sql_round,
    to_units,
)
from ..plans.checkpointing import result_checkpoint
from ..plans.memos import note_warm_hit, register_memo
from ..plans.registry import query
from ..sources import load

N_QUERY_USERS = 10
K_NEIGHBORS = 5
TOPK_RECS = 5
# Per-item contributor cap for the KNN self-join: a popular item's
# raters contribute O(n_i^2) candidate pairs (the classic hot-item
# blowup); only the item's top-ITEM_CAP raters (rating DESC, user_id
# tie-break — deterministic on every engine) enter the pair join, so
# one item can never contribute more than N_QUERY_USERS * ITEM_CAP
# pairs. The cap BINDS at fixture scale (max raters/item ~53, mean
# ~30), so the DuckDB oracle — which applies the identical cap —
# actively verifies the capped semantics rather than a no-op.
ITEM_CAP = 32

_RATINGS_SQL = """
  SELECT o.o_custkey AS user_id, l.l_partkey AS item_id,
         CAST(least(5, greatest(1, CAST(floor(avg(l.l_quantity) / 10.0) AS BIGINT) + 1)) AS DOUBLE) AS rating
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  GROUP BY o.o_custkey, l.l_partkey
"""


def ratings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user, item, rating) triples: quantity -> 1..5 integer-valued
    rating (the fixture's stand-in for D:5's user::book::rate)."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey", "l_quantity")
    return (
        # no broadcast hint: AQE picks the join side from runtime stats
        # (a forced broadcast of orders measured ~25% slower here)
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("o_custkey").alias("user_id"), F.col("l_partkey").alias("item_id")
        )
        .agg(
            F.least(
                F.lit(5),
                F.greatest(
                    F.lit(1), (F.floor(F.avg("l_quantity") / 10.0) + 1).cast("long")
                ),
            )
            .cast("double")
            .alias("rating")
        )
    )


@query(
    "ratings_matrix_stats",
    oracle=f"""
WITH r AS ({_RATINGS_SQL})
SELECT COUNT(*) AS n_ratings,
       COUNT(DISTINCT user_id) AS n_users,
       COUNT(DISTINCT item_id) AS n_items,
       {sql_fixed_avg('rating', 0, 4)} AS avg_rating
FROM r
""",
    tags=("ML8", "A8"),
)
def ratings_matrix_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's first step: distinct-count users/books of the
    ratings matrix (D:41-45 — 251,053 users x 76,377 books there)."""
    r = ratings(spark, sf_dir)
    return r.agg(
        F.count("*").alias("n_ratings"),
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct("item_id").alias("n_items"),
        fixed_avg(F.col("rating"), 0, 4).alias("avg_rating"),
    )


@query("ml_als_recommend", tags=("ML8", "ML13", "J8", "U2", "U4", "S8"))
def ml_als_recommend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ML8 (D:23-108): ALS rank=10, regParam=0.01 (D:62-64) on the 60/40
    seed-11 split (D:51). Returns one summary row: test MSE (D:67-82)
    plus the hit-rate evaluation — top-{TOPK_RECS} recs per user
    (already-rated excluded via anti-join, D:21/D:91) intersected with
    the user's held-out items (D:89-99). maxIter 20 -> 10 vs the
    reference (fixture-scale runtime; documented deviation)."""
    r = ratings(spark, sf_dir).cache()
    train, test = r.randomSplit([0.6, 0.4], seed=11)
    als = ALS(
        rank=10,
        maxIter=10,
        regParam=0.01,
        userCol="user_id",
        itemCol="item_id",
        ratingCol="rating",
        seed=11,
        coldStartStrategy="drop",
    )
    model = als.fit(train)
    mse = RegressionEvaluator(
        labelCol="rating", predictionCol="prediction", metricName="mse"
    ).evaluate(model.transform(test))

    users = r.select("user_id").distinct()
    recs = (
        model.recommendForUserSubset(users, TOPK_RECS + 20)
        .select("user_id", F.explode("recommendations").alias("rec"))
        .select(
            "user_id",
            F.col("rec.item_id").alias("item_id"),
            F.col("rec.rating").alias("score"),
        )
    )
    # D:21: never recommend what the user already rated (train side).
    unseen = recs.join(train.select("user_id", "item_id"), ["user_id", "item_id"], "left_anti")
    # rank by the model's predicted score (physical row order after the
    # anti-join shuffle is arbitrary — never rank on it)
    w = Window.partitionBy("user_id").orderBy(F.desc("score"), F.asc("item_id"))
    topk = unseen.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= TOPK_RECS
    )
    # D:89-99: hit = recommended item actually "read" in the held-out set.
    hits = topk.join(test.select("user_id", "item_id"), ["user_id", "item_id"]).count()
    n_users = users.count()
    # audited determinism scalar (r8, the ML10/ML12 treatment): the
    # top-k recommendation scores summed in exact 4-decimal integer
    # units (to_units accumulates as DECIMAL, so the value is
    # independent of row/partition order). The driver's rows-only check
    # previously pinned only "1 row returned"; this column turns it
    # into a determinism pin — tests/test_ml.py asserts it is identical
    # across two runs, and any seed/split/ranking regression changes it.
    units = topk.agg(F.sum(to_units(F.col("score"), 4)).alias("u")).collect()[0]["u"]
    r.unpersist()
    return spark.createDataFrame(
        [
            (
                int(n_users),
                round(float(mse), 4),
                int(hits),
                round(hits / float(n_users * TOPK_RECS), 4),
                int(units or 0),
            )
        ],
        "n_users bigint, mse_test double, n_hits bigint, hit_rate double,"
        " audit_topk_score_units bigint",
    )


_COS_PAIRS_SQL = f"""
  r AS ({_RATINGS_SQL}),
  norms AS (
    SELECT user_id, sqrt(sum(rating * rating)) AS nrm FROM r GROUP BY user_id
  ),
  contrib AS (
    SELECT item_id, user_id, rating FROM (
      SELECT item_id, user_id, rating,
             ROW_NUMBER() OVER (PARTITION BY item_id
                                ORDER BY rating DESC, user_id) AS cr
      FROM r
    ) WHERE cr <= {ITEM_CAP}
  ),
  pairs AS (
    SELECT a.user_id AS u, b.user_id AS v, sum(a.rating * b.rating) AS dp
    FROM r a JOIN contrib b ON a.item_id = b.item_id AND a.user_id <> b.user_id
    WHERE a.user_id <= {N_QUERY_USERS}
    GROUP BY a.user_id, b.user_id
  ),
  sims AS (
    SELECT p.u, p.v,
           {sql_round('p.dp / (na.nrm * nb.nrm)', 4)} AS sim
    FROM pairs p
    JOIN norms na ON na.user_id = p.u
    JOIN norms nb ON nb.user_id = p.v
  ),
  ranked AS (
    SELECT u, v, sim,
           CAST(ROW_NUMBER() OVER (PARTITION BY u ORDER BY sim DESC, v) AS BIGINT) AS rn
    FROM sims
  )
"""


# Session-scoped memos of the canonical ratings frame and the ranked
# similarity frame: knn_user_neighbors and knn_user_recommend both
# consume them, and in a driver/test session they run back-to-back —
# without the memo the second query rebuilds the whole capped self-join
# pipeline from scratch, and without the shared ratings frame a single
# cold knn_user_recommend computes the orders⨝lineitem aggregation
# twice (once for its own uses, once inside the pairs pipeline). Keyed
# by (session, data dir), which is sound ONLY because both memos hold
# the canonical full derivation (no parameters — a caller wanting a
# filtered split builds its own frames, as ml/ranking_eval.py does with
# the itemcf helpers). Memoized frames are .cache()d (NOT checkpointed:
# bench's between-query block release must stay survivable — a cache
# recomputes, a truncated-lineage checkpoint cannot) and live for the
# session; a long-lived driver releases them with its normal
# between-pipeline block cleanup (see bench.py's _release_leaked_state).
_RATINGS_MEMO: dict[tuple[str, str], DataFrame] = register_memo({})
_PAIRS_MEMO: dict[tuple[str, str], DataFrame] = register_memo({})
# the pruned norm path's capped-contributor frame (canonical auto
# derivation only — see _user_cosine_pairs): cached because the pairs
# plan references it twice, tracked here so clear_memos releases it
_PRUNED_B_MEMO: dict[tuple[str, str], DataFrame] = register_memo({})


def _memo_key(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """(applicationId, dir): unlike id(spark), a stopped session's key
    can never collide with a new session reusing the same address, and
    the key itself holds no reference to the session."""
    return (spark.sparkContext.applicationId, sf_dir)


def _evict_other_sessions(key: tuple[str, str]) -> None:
    """Drop memo entries from any OTHER application: cached DataFrames
    pin their (possibly stopped) SparkSession, so the memos hold at
    most the live session's frames. Delegates to the central registry
    (plans/memos.py) so every registered memo — including ones added
    later — is swept; a hand-maintained tuple here once missed
    _PRUNED_B_MEMO."""
    from ..plans.memos import evict_other_sessions

    evict_other_sessions(key)


def clear_memos() -> None:
    """Session-teardown / bench-cleanup hook, kept for API stability:
    clears EVERY registered memo via the central registry (not just
    this module's — callers use it as 'release all cached state')."""
    from ..plans.memos import clear_all

    clear_all()


def cached_ratings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical ratings frame, cached once per (session, dir).
    In plan-audit mode (SPARK_GRAFT_NO_CHECKPOINT) returns the plain
    uncached derivation so .explain shows the real pipeline."""
    import os

    if os.environ.get("SPARK_GRAFT_NO_CHECKPOINT"):
        return ratings(spark, sf_dir)
    key = _memo_key(spark, sf_dir)
    hit = _RATINGS_MEMO.get(key)
    if hit is None:
        _evict_other_sessions(key)
        hit = ratings(spark, sf_dir).cache()
        _RATINGS_MEMO[key] = hit
    else:
        note_warm_hit()
    return hit


def _user_cosine_pairs(
    spark: SparkSession, sf_dir: str, norm_path: str = "auto"
) -> DataFrame:
    """Sparse user-user cosine over the canonical ratings derivation:
    shared-item self-join -> exact integer dot products -> normalize.
    Returns (u, v, sim, rn) ranked per u, memoized per (session, dir).

    The self-join's wide side is pre-pruned twice: first to the items
    the query users rated (a semi-join that commutes with the per-item
    window because whole partitions drop), then to each surviving
    item's top-ITEM_CAP raters (see ITEM_CAP). The window shuffles on
    item_id over that reduced frame only, and the query-user side is
    BROADCAST (it holds only the N_QUERY_USERS query users' ratings,
    tiny by construction), so the pair join adds no exchange at all:
    the capped side streams straight out of its window shuffle.

    Cold-path cost analysis (r7, sf0.1, steady-state): a cold
    knn_user_recommend is ~4.8s vs ~1.3s warm-memo, decomposing into
    ratings cache fill ~1.6s (the orders⨝lineitem aggregation, 600k
    rows), this pairs pipeline ~2.2s, final scoring ~1.4s — three
    sequential shuffle stages each doing irreducible work; the gap IS
    the memo's value, not hidden waste. The r5 hypothesis that the
    norms aggregation (a separate groupBy over the cached ratings,
    ~1.2s standalone) should instead read the capped side's parent was
    tested and REJECTED at this scale: pruning the norm input to
    candidate users (cache the capped frame, distinct its users,
    semi-join ratings before the norm groupBy) measured 4.6s vs 2.9s
    for the pairs stage — the cache barrier + distinct outweigh
    pruning 15k users to 13k, because at fixture scale nearly every
    user rates a query item. The pruned variant only wins when
    |capped contributors| << |users| (highly selective query sets on a
    100 TB catalog) — that switch is CODE, not prose (r8): ``auto``
    compares a cheap upper bound on the capped-contributor count
    (|query items| x ITEM_CAP, from two sub-second counts over the
    cached ratings) against the catalog user count with a 4x guard
    band, so the pruned norm source
    (``r.join(broadcast(candidate_users), "user_id", "left_semi")``)
    only engages when contributors are provably a small fraction of
    the catalog. ``full``/``pruned`` force a side for tests, bypassing
    the memo (which is keyed for the canonical auto derivation only
    — a forced path must never be served from, or stored into, it)."""
    import os

    # plan-audit mode (SPARK_GRAFT_NO_CHECKPOINT) bypasses the memo: a
    # cache is a materialization barrier that would hide the pipeline
    # from .explain exactly like the checkpoint the audit disables
    audit_mode = bool(os.environ.get("SPARK_GRAFT_NO_CHECKPOINT"))
    canonical = norm_path == "auto"
    memo_key = _memo_key(spark, sf_dir)
    if not audit_mode and canonical:
        hit = _PAIRS_MEMO.get(memo_key)
        if hit is not None:
            note_warm_hit()
            return hit
        _evict_other_sessions(memo_key)
    r = cached_ratings(spark, sf_dir)
    a = r.select(
        F.col("user_id").alias("u"), "item_id", F.col("rating").alias("ra")
    ).filter(F.col("u") <= N_QUERY_USERS)
    # Only items the query users rated can produce pairs, so restrict
    # the contributor side BEFORE the per-item ranking window: the
    # restriction commutes with a PARTITION BY item_id window (dropping
    # whole partitions never changes the ranking inside survivors), and
    # it shrinks the window shuffle from the full catalog to the query
    # users' items — at 100 TB that is the difference between ranking
    # every item's raters and ranking a few hundred items' raters.
    qitems = a.select("item_id").distinct()
    cw = Window.partitionBy("item_id").orderBy(F.desc("rating"), F.asc("user_id"))
    b = (
        r.join(F.broadcast(qitems), "item_id", "left_semi")
        .withColumn("cr", F.row_number().over(cw))
        .filter(F.col("cr") <= ITEM_CAP)
        .select(F.col("user_id").alias("v"), "item_id", F.col("rating").alias("rb"))
    )
    # Norm-source switch (docstring): |query items| x ITEM_CAP bounds
    # the capped-contributor count from above; only when that bound is
    # well under the catalog user count can pruning the norm input win
    # (the r7 measurement: at fixture scale contributors ~= catalog and
    # the pruned path's cache barrier + distinct LOST 4.6s vs 2.9s).
    if norm_path == "auto":
        n_users = r.select("user_id").distinct().count()
        n_qitems = qitems.count()
        norm_path = "pruned" if n_qitems * ITEM_CAP * 4 < n_users else "full"
    if norm_path == "pruned":
        # selective regime: b feeds BOTH the cand_users branch and the
        # pair join, and its subtree pays a window over the
        # item-restricted ratings — recomputing it twice measurably
        # regressed knn at sf1 (r9: 2.2s -> 3.5s when the r8-advice fix
        # naively dropped the cache; an unpersist-after-materialize
        # variant ALSO regressed, because re-executions of the memoized
        # pairs frame then rebuild b twice per action). So the
        # canonical path caches b and REGISTERS it in _PRUNED_B_MEMO —
        # the advice's clearable-memo option: bench/session hygiene
        # (clear_memos) releases it between blocks, so nothing pins for
        # the life of the session. Forced (non-canonical) calls skip
        # the cache entirely: test-only, correctness-checked, no pin.
        if not audit_mode and canonical:
            b = b.cache()
            _PRUNED_B_MEMO[memo_key] = b
        cand_users = (
            b.select(F.col("v").alias("user_id"))
            .union(a.select(F.col("u").alias("user_id")))
            .distinct()
        )
        norm_src = r.join(F.broadcast(cand_users), "user_id", "left_semi")
    else:
        norm_src = r
    norms = norm_src.groupBy("user_id").agg(
        F.sqrt(F.sum(F.col("rating") * F.col("rating"))).alias("nrm")
    )
    pairs = (
        F.broadcast(a)
        .join(b, ["item_id"])
        .filter(F.col("u") != F.col("v"))
        .groupBy("u", "v")
        .agg(F.sum(F.col("ra") * F.col("rb")).alias("dp"))
    )
    # no broadcast hint on norms: the PAIR set is the small side by
    # construction (bounded by N_QUERY_USERS * ITEM_CAP * items/user),
    # and at scale the full norms frame (one row per user) is the side
    # that must NOT be broadcast — AQE builds on the pair side.
    sims = (
        pairs.join(norms.withColumnRenamed("user_id", "u"), "u")
        .withColumnRenamed("nrm", "na")
        .join(norms.withColumnRenamed("user_id", "v"), "v")
        .select(
            "u", "v", round_to(F.col("dp") / (F.col("na") * F.col("nrm")), 4).alias("sim")
        )
    )
    w = Window.partitionBy("u").orderBy(F.desc("sim"), F.asc("v"))
    out = sims.withColumn("rn", F.row_number().over(w).cast("bigint"))
    if audit_mode or not canonical:
        return out
    out = out.cache()
    _PAIRS_MEMO[memo_key] = out
    return out


@query(
    "knn_user_neighbors",
    oracle=f"""
WITH {_COS_PAIRS_SQL}
SELECT u AS user_id, v AS neighbor_id, sim, rn
FROM ranked WHERE rn <= {K_NEIGHBORS}
""",
    tags=("ML9",),
)
def knn_user_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ML9 step 1 (D:13-17): top-{K_NEIGHBORS} cosine-nearest users for
    the first {N_QUERY_USERS} users. Fully SQL-expressible -> full
    oracle; determinism from exact integer dot products + rounded sim +
    id tie-break."""
    p = _user_cosine_pairs(spark, sf_dir)
    return (
        p.filter(F.col("rn") <= K_NEIGHBORS)
        .select(
            F.col("u").alias("user_id"), F.col("v").alias("neighbor_id"), "sim", "rn"
        )
    )


@query(
    "knn_user_recommend",
    oracle=f"""
WITH {_COS_PAIRS_SQL},
neigh AS (SELECT u, v, sim FROM ranked WHERE rn <= {K_NEIGHBORS}),
r2 AS (SELECT * FROM r),
scored AS (
  SELECT n.u AS user_id, r2.item_id,
         {sql_fixed_sum('n.sim * r2.rating', 4, 3)} AS raw_score
  FROM neigh n JOIN r2 ON r2.user_id = n.v
  GROUP BY n.u, r2.item_id
),
unseen AS (
  SELECT s.user_id, s.item_id, s.raw_score AS score
  FROM scored s
  LEFT JOIN r2 mine ON mine.user_id = s.user_id AND mine.item_id = s.item_id
  WHERE mine.user_id IS NULL
),
rr AS (
  SELECT user_id, item_id, score,
         CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY score DESC, item_id)
              AS BIGINT) AS rn
  FROM unseen
)
SELECT user_id, item_id, score, rn FROM rr WHERE rn <= {TOPK_RECS}
""",
    bench=True,
    tags=("ML9", "J8"),
)
def knn_user_recommend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ML9 steps 2-3 (D:17-21): similarity-weighted accumulated scores
    from the top-{K_NEIGHBORS} neighbors' ratings, already-rated items
    excluded (anti-join, D:21), top-{TOPK_RECS} per user."""
    # the ratings frame feeds the neighbor ratings, the anti-join, AND
    # the pairs pipeline inside the memo — one shared session cache (S8)
    # so a cold run aggregates orders⨝lineitem exactly once
    r = cached_ratings(spark, sf_dir)
    neigh = (
        _user_cosine_pairs(spark, sf_dir)
        .filter(F.col("rn") <= K_NEIGHBORS)
        .select("u", "v", "sim")
    )
    # neigh is at most N_QUERY_USERS * K_NEIGHBORS rows — broadcasting
    # it turns the neighbor-ratings join into a map-side hash join, so
    # the full ratings frame never shuffles on v
    scored = (
        F.broadcast(neigh).join(r.withColumnRenamed("user_id", "v"), "v")
        # one exchange instead of two: hash-partitioning on user_id ALONE
        # satisfies the aggregate's ClusteredDistribution(user_id,
        # item_id) (a subset of the grouping keys co-locates every
        # group) AND the final rank window's ClusteredDistribution
        # (user_id) — without this, Spark exchanges on (user_id,
        # item_id) for the aggregate and then AGAIN on user_id for the
        # window
        .repartition(F.col("u"))
        .groupBy(F.col("u").alias("user_id"), "item_id")
        # sim sits on a 4dp grid (rounded cosine), rating is integral, so
        # sim*rating units at dec=4 are exact — the weighted score ranks
        # identically on every engine/partitioning
        .agg(fixed_sum(F.col("sim") * F.col("rating"), 4, 3).alias("raw_score"))
    )
    unseen = scored.join(r.select("user_id", "item_id"), ["user_id", "item_id"], "left_anti")
    w = Window.partitionBy("user_id").orderBy(
        F.desc("score"), F.asc("item_id")
    )
    out = (
        unseen.select("user_id", "item_id", F.col("raw_score").alias("score"))
        .withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= TOPK_RECS)
    )
    # localCheckpoint materializes the result ON THE EXECUTORS while the
    # ratings cache is hot — unlike a driver collect(), the
    # recommendation set stays distributed (at 100 TB the per-user
    # top-k across all users is not driver-sized). The shared ratings
    # cache is NOT unpersisted here: knn_user_neighbors' memoized pairs
    # frame recomputes through it, and session-level block cleanup
    # (bench.py's _release_leaked_state, or a real driver's
    # between-pipeline hygiene) owns its lifetime.
    out = result_checkpoint(out)
    return out


# --- ALS scale-form twin ---------------------------------------------------
# Deterministic 1-in-ALS_SAMPLE_MOD user sample for the bounded-cost ALS
# twin: xxhash64 is seed-stable across runs, partitionings, and Spark
# versions within a release line, so the sampled user set is a pure
# function of the data (same pattern as operators/sampling.py's
# hash_sample_events).
ALS_SAMPLE_MOD = 8
ALS_SAMPLE_REMAINDER = 3
ALS_SAMPLE_ITERS = 5


@query("ml_als_recommend_sampled", tags=("ML8", "ML13", "J8", "U4", "S8"))
def ml_als_recommend_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-form twin of ml_als_recommend (same treatment FP-growth got
    in fpgrowth_topk_fraction_support): the exact form is the
    reference-parity anchor (D:23-108, rank 10 / maxIter 10 over the
    FULL ratings nnz) and reads 8.5-11.5x wall at 10x data — ~linear in
    nnz as ALS theory predicts, but ~123s absolute at sf1, the
    registry's documented inherent-model-cost query. This twin bounds
    the constant, not the asymptote, with two knobs a 100 TB deployment
    would actually turn:

    (a) train on a deterministic 1-in-ALS_SAMPLE_MOD user sample
        (xxhash64(user_id) — seed-stable, partitioning-independent),
        so per-sweep cost ~ nnz / ALS_SAMPLE_MOD;
    (b) ALS_SAMPLE_ITERS sweeps instead of 10 (ALS residual
        improvement is steeply front-loaded; the fixture MSE gap to
        the anchor is readable from the two summary rows).

    Evaluation is form-identical to the anchor — MSE on the sampled
    users' held-out 40%, top-TOPK_RECS hit rate with the train-side
    anti-join — so the quality/cost trade is a two-row diff, except the
    60/40 split itself is a salted-hash predicate (not randomSplit,
    which is partition-layout-dependent), making train/test MEMBERSHIP
    a pure function of the data across cluster shapes. (The fitted
    factors are still floating-point accumulations whose order ALS
    does not pin across layouts, so the downstream scalars are
    layout-stable only to numerical noise — same property as the
    anchor; what the hash split removes is the one discrete,
    arbitrarily-large divergence source.) Rows-only check with the
    r8-style audited determinism scalar."""
    r = cached_ratings(spark, sf_dir)
    sampled = r.filter(
        F.pmod(F.xxhash64(F.col("user_id")), F.lit(ALS_SAMPLE_MOD))
        == F.lit(ALS_SAMPLE_REMAINDER)
    )
    # 60/40 split from a SECOND salted hash rather than randomSplit:
    # randomSplit(seed=...) is only stable for a fixed partition layout
    # of the input, so the anchor's split (kept for reference parity,
    # D:51) can differ across cluster shapes. The twin's selling point
    # is cross-layout determinism, so its split is a pure function of
    # (user_id, item_id) like the user sample above.
    is_train = (
        F.pmod(F.xxhash64(F.col("user_id"), F.col("item_id"), F.lit("split")), F.lit(5))
        < F.lit(3)
    )
    train = sampled.filter(is_train)
    test = sampled.filter(~is_train)
    train = train.cache()
    als = ALS(
        rank=10,
        maxIter=ALS_SAMPLE_ITERS,
        regParam=0.01,
        userCol="user_id",
        itemCol="item_id",
        ratingCol="rating",
        seed=11,
        coldStartStrategy="drop",
    )
    model = als.fit(train)
    mse = RegressionEvaluator(
        labelCol="rating", predictionCol="prediction", metricName="mse"
    ).evaluate(model.transform(test))

    users = sampled.select("user_id").distinct()
    recs = (
        model.recommendForUserSubset(users, TOPK_RECS + 20)
        .select("user_id", F.explode("recommendations").alias("rec"))
        .select(
            "user_id",
            F.col("rec.item_id").alias("item_id"),
            F.col("rec.rating").alias("score"),
        )
    )
    unseen = recs.join(
        train.select("user_id", "item_id"), ["user_id", "item_id"], "left_anti"
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("score"), F.asc("item_id"))
    topk = unseen.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= TOPK_RECS
    )
    hits = topk.join(test.select("user_id", "item_id"), ["user_id", "item_id"]).count()
    n_users = users.count()
    units = topk.agg(F.sum(to_units(F.col("score"), 4)).alias("u")).collect()[0]["u"]
    train.unpersist()
    return spark.createDataFrame(
        [
            (
                int(n_users),
                round(float(mse), 4),
                int(hits),
                round(hits / float(n_users * TOPK_RECS), 4) if n_users else 0.0,
                int(units or 0),
            )
        ],
        "n_users bigint, mse_test double, n_hits bigint, hit_rate double,"
        " audit_topk_score_units bigint",
    )
