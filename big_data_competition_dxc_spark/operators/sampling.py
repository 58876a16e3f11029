"""Sampling operators for training-data pipelines.

Two flavors, both reproducible:

- **Deterministic hash sampling** (the 100 TB default): keep a row iff
  a portable content hash of its key lands under the rate threshold.
  No RNG, no seed bookkeeping — the SAME rows are selected on any
  engine, any run, any cluster size, which is what makes train/test
  splits auditable. Fully oracle-paired (same md5 arithmetic as the
  dedup family).
- **Stratified sampling** (`sampleBy`): per-stratum fractions with a
  seed. Spark's RNG is engine-specific, so this is a rows-only check
  with self-validating bounds in tests (fraction within tolerance per
  stratum).

Also here: approx_count_distinct, the sketch the exact distinct-count
queries document as their scale path — checked against the exact
answer within HLL tolerance — and the MERGEABLE DataSketches form
(`hll_sketch_rollup`): per-day sketches unioned into an all-days
estimate without rescanning raw events, the stored-sketch
architecture a 100 TB deployment answers distinct-over-any-window
with.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import fixed_avg, round_to, sql_fixed_avg, sql_round
from ..plans.registry import query
from ..sources import load

SAMPLE_PCT = 10  # keep ~10%


@query(
    "hash_sample_events",
    oracle=f"""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_sampled,
       {sql_fixed_avg('value', 2, 4)} AS avg_value
FROM events
WHERE ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT % 100 < {SAMPLE_PCT}
GROUP BY event_type
""",
    tags=("U4", "sampling"),
)
def hash_sample_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~{SAMPLE_PCT}% sample: md5(event_id) mod 100 under
    threshold — the reproducible split primitive (same selection on
    every engine and run; grows stably when the rate is raised)."""
    from ..functions.hashing import md5_bigint

    ev = load(spark, sf_dir, "events")
    bucket = md5_bigint(F.col("event_id").cast("string")) % 100
    return (
        ev.filter(bucket < SAMPLE_PCT)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_sampled"),
            fixed_avg(F.col("value"), 2, 4).alias("avg_value"),
        )
    )


# Per-stratum keep rates in basis points — view/click downsampled 5x,
# error halved, signup/purchase kept whole (the class-rebalance step of
# a training pipeline). Realized as a deterministic hash threshold, NOT
# sampleBy: Spark's seeded RNG is engine- and partitioning-specific, so
# a seeded sample can never hash-match a SQL oracle nor reproduce across
# cluster sizes; md5 of a salted key selects the SAME rows everywhere.
_STRATA_BPS = {"view": 2000, "click": 2000, "error": 5000, "signup": 10000, "purchase": 10000}
_STRATA_SQL_CASE = "CASE event_type " + " ".join(
    f"WHEN '{k}' THEN {v}" for k, v in _STRATA_BPS.items()
) + " ELSE 0 END"


@query(
    "stratified_sample",
    oracle=f"""
WITH scored AS (
  SELECT event_type,
         ('0x' || substr(md5('strat:' || CAST(event_id AS VARCHAR)), 1, 15))::BIGINT
           % 10000 AS u,
         {_STRATA_SQL_CASE} AS keep_bps
  FROM events
)
SELECT event_type,
       CAST(COUNT(*) FILTER (WHERE u < keep_bps) AS BIGINT) AS n_sampled,
       CAST(COUNT(*) AS BIGINT) AS n_total,
       {sql_round('CAST(COUNT(*) FILTER (WHERE u < keep_bps) AS DOUBLE)'
                  ' / CAST(COUNT(*) AS DOUBLE)', 4)} AS realized_frac
FROM scored
GROUP BY event_type
""",
    tags=("U4", "sampling"),
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling with per-stratum fractions, engine-exact:
    keep a row iff md5('strat:'||event_id) mod 10000 lands under its
    stratum's basis-point threshold. Same rebalancing semantics the
    seeded ``sampleBy`` gave (r1–r5 form), but deterministic — the
    identical row set on any engine, run, or cluster size, which is
    what makes a training split auditable (and lets DuckDB hash-verify
    it). The salt ('strat:') decorrelates this selection from the other
    hash samples over the same table."""
    from ..functions.hashing import md5_bigint

    ev = load(spark, sf_dir, "events")
    u = md5_bigint(F.concat(F.lit("strat:"), F.col("event_id").cast("string"))) % 10000
    keep_bps = F.coalesce(
        *[
            F.when(F.col("event_type") == k, F.lit(v))
            for k, v in _STRATA_BPS.items()
        ],
        F.lit(0),
    )
    kept = F.when(u < keep_bps, 1).otherwise(0)
    return ev.groupBy("event_type").agg(
        F.sum(kept).cast("bigint").alias("n_sampled"),
        F.count("*").alias("n_total"),
        round_to(
            F.sum(kept).cast("double") / F.count("*").cast("double"), 4
        ).alias("realized_frac"),
    )


# Generous 3-sigma-ish bound on the HLL relative error: Spark runs
# HLL++ at rsd=0.02, DuckDB's HyperLogLog is tighter by default — both
# sketches sit far inside 6% on any input this engine scans.
HLL_REL_BOUND = 0.06


@query(
    "approx_distinct_check",
    oracle=f"""
SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
       CAST(COUNT(DISTINCT event_id) AS BIGINT) AS exact_events,
       abs(approx_count_distinct(user_id) - COUNT(DISTINCT user_id))
         <= {HLL_REL_BOUND} * COUNT(DISTINCT user_id) AS users_within_bound,
       abs(approx_count_distinct(event_id) - COUNT(DISTINCT event_id))
         <= {HLL_REL_BOUND} * COUNT(DISTINCT event_id) AS events_within_bound
FROM events
""",
    tags=("A8", "sketch"),
)
def approx_distinct_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL++) vs the exact count — the sketch
    every 100 TB distinct-count should use. Raw sketch estimates are
    engine-specific, so the DETERMINISTIC contract is published
    instead: the exact counts (hash-compared cross-engine) plus a
    boolean per column asserting the engine's OWN sketch lands within
    the documented relative-error bound — each engine verifies its own
    sketch against the shared exact answer, and the booleans must agree
    (both true) for the hash gate to pass."""
    ev = load(spark, sf_dir, "events")
    out = ev.agg(
        F.countDistinct("user_id").alias("exact_users"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.countDistinct("event_id").alias("exact_events"),
        F.approx_count_distinct("event_id", rsd=0.02).alias("approx_events"),
    )
    within = lambda a, e: (  # noqa: E731
        F.abs(F.col(a) - F.col(e)) <= F.lit(HLL_REL_BOUND) * F.col(e)
    )
    return out.select(
        "exact_users",
        "exact_events",
        within("approx_users", "exact_users").alias("users_within_bound"),
        within("approx_events", "exact_events").alias("events_within_bound"),
    )


_REBALANCE_ORACLE = f"""
WITH counts AS (SELECT lang, COUNT(*) AS n_lang FROM documents GROUP BY 1),
t AS (SELECT lang, MIN(n_lang) OVER () AS target FROM counts),
ranked AS (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (
           PARTITION BY lang
           ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT,
                    doc_id) AS rk
  FROM documents
)
SELECT r.doc_id, r.lang, CAST(r.rk AS BIGINT) AS rk
FROM ranked r JOIN t USING (lang)
WHERE r.rk <= t.target
"""


@query("class_rebalance_downsample", oracle=_REBALANCE_ORACLE, tags=("U4", "sampling", "rebalance"))
def class_rebalance_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balance a training corpus by downsampling every language
    to the smallest class's size — deterministically: docs are ranked
    within each class by a content hash (not RNG), so the same rows
    survive on every engine, run, and cluster size, and raising the
    target only ADDS rows (stable incremental splits). The target is a
    window-min over the per-class counts (a 5-row frame) equi-joined
    back by class — no scalar cross join, and the fact table shuffles
    once for the rank."""
    from pyspark.sql import Window

    from ..functions.hashing import md5_bigint

    docs = load(spark, sf_dir, "documents").select("doc_id", "lang")
    counts = docs.groupBy("lang").agg(F.count("*").alias("n_lang"))
    targets = counts.select(
        "lang", F.min("n_lang").over(Window.partitionBy()).alias("target")
    )
    wr = Window.partitionBy("lang").orderBy(
        md5_bigint(F.col("doc_id").cast("string")), "doc_id"
    )
    ranked = docs.withColumn("rk", F.row_number().over(wr).cast("bigint"))
    return (
        ranked.join(F.broadcast(targets), "lang")
        .filter(F.col("rk") <= F.col("target"))
        .select("doc_id", "lang", "rk")
    )


# Quality-weighted sampling: keep-probability proportional to a quality
# proxy, realized with the SAME deterministic md5-uniform as
# hash_sample_events so the selection is auditable and engine-exact.
# The threshold compare stays in INTEGERS (md5 % 10000 vs n_chars * 5
# clamped to [1000, 10000]) — no float product ever reaches the
# boundary, so the oracle hash cannot flake. This is the corpus
# curation step between uniform sampling and hard filtering: short
# (low-quality-proxy) docs are kept at 10%, documents >= 2000 chars
# always survive, the middle scales linearly.
_WEIGHTED_ORACLE = """
WITH scored AS (
  SELECT lang, n_chars,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 10000 AS u,
         LEAST(10000, GREATEST(1000, n_chars * 5)) AS keep_bps
  FROM documents
)
SELECT lang,
       CAST(COUNT(*) FILTER (WHERE u < keep_bps) AS BIGINT) AS n_kept,
       CAST(COUNT(*) AS BIGINT) AS n_total,
       CAST(SUM(n_chars) FILTER (WHERE u < keep_bps) AS BIGINT) AS kept_chars
FROM scored
GROUP BY lang
"""


@query(
    "quality_weighted_sample",
    oracle=_WEIGHTED_ORACLE,
    tags=("U4", "sampling", "textops"),
)
def quality_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per language: documents surviving a quality-weighted
    deterministic sample (keep-probability = clamp(n_chars/2000,
    0.1, 1.0), realized as integer basis points against md5(doc_id))
    next to the unsampled totals."""
    from ..functions.hashing import md5_bigint

    docs = load(spark, sf_dir, "documents")
    u = md5_bigint(F.col("doc_id").cast("string")) % 10000
    keep_bps = F.least(
        F.lit(10000), F.greatest(F.lit(1000), F.col("n_chars") * 5)
    )
    kept = F.when(u < keep_bps, 1).otherwise(0)
    return docs.groupBy("lang").agg(
        F.sum(kept).cast("bigint").alias("n_kept"),
        F.count("*").alias("n_total"),
        F.sum(F.when(u < keep_bps, F.col("n_chars"))).cast("bigint").alias(
            "kept_chars"
        ),
    )


# Rank-error window for the quantile-sketch contract: the approx value
# must lie between the exact percentiles at p±RANK_EPS. Spark's
# approx_percentile at accuracy=10000 documents rank error <= 1e-4;
# DuckDB's t-digest approx_quantile is looser but far inside 0.5% rank
# error at the probed quantiles — 0.005 is generous for both.
RANK_EPS = 0.005


@query(
    "approx_quantile_check",
    oracle=f"""
SELECT {sql_round('quantile_cont(l_extendedprice, 0.50)', 4)} AS exact_p50,
       {sql_round('quantile_cont(l_extendedprice, 0.99)', 4)} AS exact_p99,
       approx_quantile(l_extendedprice, 0.50)
         BETWEEN quantile_cont(l_extendedprice, {0.50 - RANK_EPS})
             AND quantile_cont(l_extendedprice, {0.50 + RANK_EPS})
         AS p50_within_rank_eps,
       approx_quantile(l_extendedprice, 0.99)
         BETWEEN quantile_cont(l_extendedprice, {0.99 - RANK_EPS})
             AND quantile_cont(l_extendedprice, {0.99 + RANK_EPS})
         AS p99_within_rank_eps
FROM lineitem
""",
    tags=("A9", "sketch"),
)
def approx_quantile_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (mergeable sketch, accuracy=10000 -> rank
    error <= 0.01%) vs the exact interpolated percentile — the one-pass
    bounded-memory quantile every 100 TB percentile query should swap
    to (documented in percentile_prices). Published contract: the exact
    percentiles (hash-compared cross-engine at 4dp, same idiom as
    percentile_prices) plus a boolean per quantile asserting the
    engine's OWN sketch value lands inside the exact [p-eps, p+eps]
    rank window — a value-space-free error bound, so each engine
    verifies its own sketch and the booleans hash-match."""
    li = load(spark, sf_dir, "lineitem")
    col = "l_extendedprice"
    out = li.agg(
        F.percentile(col, 0.5).alias("exact_p50"),
        F.percentile(col, 0.5 - RANK_EPS).alias("p50_lo"),
        F.percentile(col, 0.5 + RANK_EPS).alias("p50_hi"),
        F.approx_percentile(col, 0.5, 10000).alias("approx_p50"),
        F.percentile(col, 0.99).alias("exact_p99"),
        F.percentile(col, 0.99 - RANK_EPS).alias("p99_lo"),
        F.percentile(col, 0.99 + RANK_EPS).alias("p99_hi"),
        F.approx_percentile(col, 0.99, 10000).alias("approx_p99"),
    )
    return out.select(
        round_to(F.col("exact_p50"), 4).alias("exact_p50"),
        round_to(F.col("exact_p99"), 4).alias("exact_p99"),
        F.col("approx_p50")
        .between(F.col("p50_lo"), F.col("p50_hi"))
        .alias("p50_within_rank_eps"),
        F.col("approx_p99")
        .between(F.col("p99_lo"), F.col("p99_hi"))
        .alias("p99_within_rank_eps"),
    )


@query(
    "hll_sketch_rollup",
    oracle=f"""
WITH daily AS (
  SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS scope,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
         abs(approx_count_distinct(user_id) - COUNT(DISTINCT user_id))
           <= {HLL_REL_BOUND} * COUNT(DISTINCT user_id) AS sketch_within_bound
  FROM events GROUP BY CAST(ts AS DATE)
)
SELECT * FROM daily
UNION ALL
SELECT 'ALL',
       CAST(COUNT(DISTINCT user_id) AS BIGINT),
       abs(approx_count_distinct(user_id) - COUNT(DISTINCT user_id))
         <= {HLL_REL_BOUND} * COUNT(DISTINCT user_id)
FROM events
""",
    tags=("A8", "sketch", "scale"),
)
def hll_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches (Apache DataSketches HLL,
    built into Spark 4: hll_sketch_agg / hll_union_agg /
    hll_sketch_estimate): one sketch per day, then the ALL-days
    distinct-user estimate produced by UNIONING the stored daily
    sketches — the raw events are NOT rescanned for the rollup, which
    is the whole point: a 100 TB deployment stores one small sketch
    per (day, dimension) and answers distinct-over-any-window by
    merging sketches, never by re-aggregating history
    (`approx_distinct_check` measures the one-shot sketch; THIS query
    proves the mergeability property the stored-sketch architecture
    depends on). Contract follows the published sketch pattern: exact
    counts hash-compare cross-engine, and each engine verifies its OWN
    sketch estimate against the shared exact answer within
    {HLL_REL_BOUND} relative error — per day AND for the merged ALL
    row (a broken union would blow the ALL bound even with every
    per-day sketch healthy)."""
    ev = load(spark, sf_dir, "events").select(
        F.to_date("ts").alias("ds"), "user_id"
    )
    daily = ev.groupBy("ds").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count_distinct("user_id").alias("exact_users"),
    )
    per_day = daily.select(
        F.col("ds").cast("string").alias("scope"),
        "exact_users",
        (
            F.abs(
                F.hll_sketch_estimate(F.col("sk")) - F.col("exact_users")
            )
            <= F.lit(HLL_REL_BOUND) * F.col("exact_users")
        ).alias("sketch_within_bound"),
    )
    # the rollup: merge the DAILY SKETCHES (not the raw events)
    merged = daily.agg(
        F.hll_union_agg("sk").alias("sk_all"),
        # exact global distinct needs the raw frame once (the sketches
        # can't give exactness); computed here so the oracle can pin it
    )
    exact_all = ev.agg(F.count_distinct("user_id").alias("exact_users"))
    all_row = merged.crossJoin(F.broadcast(exact_all)).select(
        F.lit("ALL").alias("scope"),
        "exact_users",
        (
            F.abs(F.hll_sketch_estimate(F.col("sk_all")) - F.col("exact_users"))
            <= F.lit(HLL_REL_BOUND) * F.col("exact_users")
        ).alias("sketch_within_bound"),
    )
    return per_day.unionAll(all_row)


@query(
    "bitmap_distinct_rollup",
    oracle="""
WITH daily AS (
  SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS scope,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
  FROM events GROUP BY CAST(ts AS DATE)
)
SELECT * FROM daily
UNION ALL
SELECT 'ALL', CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM events
""",
    tags=("A8", "sketch", "scale"),
)
def bitmap_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT mergeable distinct counts via Spark 4 bitmap aggregates —
    the precise counterpart to `hll_sketch_rollup`'s approximate
    sketches: user ids bucket into fixed-width bitmaps
    (bitmap_bucket_number / bitmap_bit_position), one bitmap per
    (day, bucket) via bitmap_construct_agg, per-day exact distinct =
    sum of bitmap_count over the day's buckets, and the ALL-days exact
    distinct comes from bitmap_or_agg MERGING the stored per-day
    bitmaps per bucket — never re-reading raw events. Unlike HLL this
    is exact, so the oracle hash-compares the COUNTS THEMSELVES, not
    error-bound booleans. At 100 TB the stored layout is one bitmap
    row per (day, dimension, bucket): distinct-over-any-window is an
    OR-merge + popcount over the window's bitmap rows — integer-keyed
    ids only (the dense-id assumption is the operator's documented
    contract; string keys first map through a dictionary join)."""
    ev = load(spark, sf_dir, "events").select(
        F.to_date("ts").alias("ds"), "user_id"
    )
    per_bucket = ev.groupBy(
        "ds", F.bitmap_bucket_number("user_id").alias("bkt")
    ).agg(
        F.bitmap_construct_agg(F.bitmap_bit_position("user_id")).alias("bm")
    )
    per_day = per_bucket.groupBy("ds").agg(
        F.sum(F.bitmap_count("bm")).alias("n_users")
    ).select(
        F.col("ds").cast("string").alias("scope"),
        F.col("n_users").cast("bigint"),
    )
    # the rollup: OR-merge the STORED per-(day, bucket) bitmaps
    all_row = (
        per_bucket.groupBy("bkt")
        .agg(F.bitmap_or_agg("bm").alias("bm_all"))
        .agg(F.sum(F.bitmap_count("bm_all")).alias("n_users"))
        .select(F.lit("ALL").alias("scope"), F.col("n_users").cast("bigint"))
    )
    return per_day.unionAll(all_row)


# Theta sketches estimate ~1.6% rsd at default lgK; intersections
# compound the error of both inputs, so the published bound is looser
# than the single-sketch HLL bound. (At the fixtures' daily-active
# cardinalities the sketch is still in exact mode — below its nominal
# entries — so the bound binds deterministically.)
THETA_REL_BOUND = 0.10


@query(
    "theta_overlap_check",
    oracle=f"""
WITH d0 AS (SELECT MIN(CAST(ts AS DATE)) AS d FROM events),
a AS (SELECT DISTINCT user_id FROM events, d0 WHERE CAST(ts AS DATE) = d),
b AS (SELECT DISTINCT user_id FROM events, d0 WHERE CAST(ts AS DATE) = d + 1),
x AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_overlap FROM a JOIN b USING (user_id))
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM a) AS exact_a,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM b) AS exact_b,
       (SELECT n_overlap FROM x) AS exact_overlap,
       TRUE AS overlap_within_bound
""",
    tags=("A8", "sketch", "U2"),
)
def theta_overlap_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returning-user overlap between the fixture's FIRST and SECOND
    day via DataSketches Theta sketches — the set-algebra member of
    the sketch family: HLL/bitmap union-merge, but only Theta supports
    INTERSECTION, the primitive behind retention estimates when
    windows are stored as sketches instead of raw id sets. Day-1 vs
    day-2 audiences overlap only PARTIALLY (~80% of users are active
    on a given fixture day), so the intersection genuinely binds —
    a half-vs-half split saturates (every user active in both halves)
    and would pass with a broken intersection. One sketch per day,
    theta_intersection_agg over the pair, estimate checked against the
    exact overlap (the distinct self-join the sketch replaces) within
    {THETA_REL_BOUND} relative error. Contract: exact window and
    overlap cardinalities hash-compare cross-engine; Spark verifies
    its OWN sketch against the shared exact answer (DuckDB ships no
    Theta implementation, so the oracle's TRUE literal is the verdict
    the Spark side must reach)."""
    ev = load(spark, sf_dir, "events").select(
        F.to_date("ts").alias("ds"), "user_id"
    )
    d0 = ev.agg(F.min("ds").alias("d"))
    tagged = (
        ev.join(F.broadcast(d0))
        .filter((F.col("ds") == F.col("d")) | (F.col("ds") == F.date_add("d", 1)))
        .withColumn("win", F.when(F.col("ds") == F.col("d"), "a").otherwise("b"))
    )
    sketches = tagged.groupBy("win").agg(
        F.theta_sketch_agg("user_id").alias("sk"),
        F.count_distinct("user_id").alias("exact"),
    )
    inter_est = sketches.agg(
        F.theta_sketch_estimate(F.theta_intersection_agg("sk")).alias("est")
    )
    exact_overlap = (
        tagged.select("win", "user_id")
        .distinct()
        .groupBy("user_id")
        .agg(F.count("*").alias("n_wins"))
        .filter(F.col("n_wins") == 2)
        .agg(F.count("*").alias("exact_overlap"))
    )
    wide = (
        sketches.groupBy()
        .pivot("win", ["a", "b"])
        .agg(F.first("exact"))
        .crossJoin(F.broadcast(inter_est))
        .crossJoin(F.broadcast(exact_overlap))
    )
    return wide.select(
        F.col("a").cast("bigint").alias("exact_a"),
        F.col("b").cast("bigint").alias("exact_b"),
        F.col("exact_overlap").cast("bigint"),
        (
            F.abs(F.col("est") - F.col("exact_overlap"))
            <= F.lit(THETA_REL_BOUND) * F.col("exact_overlap")
        ).alias("overlap_within_bound"),
    )
