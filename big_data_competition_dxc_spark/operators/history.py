"""Temporal history operators: SCD Type-2 periods, time-weighted
averages, silence-gap detection.

The reference's pipelines snapshot state per day (流行音乐趋势预测.md:68);
these are the operators that turn an event log into VERSIONED state —
the warehouse (SCD2) and timeseries (time-weight, gap audit) staples.
All three are gaps-and-islands variants: one window over
(user_id, time), integer-microsecond arithmetic end-to-end so every
hash-compared measure is order-independent and engine-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.rounding import round_to, sql_round, to_units
from ..plans.registry import query
from ..sources import load

_SCD2_ORACLE = """
WITH flagged AS (
  SELECT user_id, event_type, ts, event_id,
         CASE WHEN LAG(event_type) OVER w IS NULL
                   OR LAG(event_type) OVER w != event_type
              THEN 1 ELSE 0 END AS new_p
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
periods AS (
  SELECT user_id, event_type, ts,
         SUM(new_p) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS pid
  FROM flagged
),
rolled AS (
  SELECT user_id, event_type, pid,
         MIN(ts) AS valid_from,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM periods GROUP BY 1, 2, 3
)
SELECT user_id, event_type, valid_from,
       LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
         AS valid_to,
       CAST(LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
              IS NULL AS INT) AS is_current,
       n_events
FROM rolled
"""


@query("scd2_type_periods", oracle=_SCD2_ORACLE, tags=("W1", "W2", "scd2"))
def scd2_type_periods(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension Type 2 built from an event log: each
    run of consecutive same-type events becomes one versioned period
    with [valid_from, valid_to) interval semantics — valid_to is the
    NEXT period's start (half-open, no overlap, no gaps), NULL marking
    the current version. Change-flag -> island id -> rollup -> lead;
    all three windows share the user_id partitioning, so the whole
    history build is one shuffle plus a tiny second window over the
    periods themselves."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = (
        load(spark, sf_dir, "events")
        .select("user_id", "event_type", "ts", "event_id")
        .withColumn(
            "new_p",
            F.when(
                F.lag("event_type").over(w).isNull()
                | (F.lag("event_type").over(w) != F.col("event_type")),
                1,
            ).otherwise(0),
        )
    )
    periods = flagged.withColumn(
        "pid", F.sum("new_p").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    rolled = periods.groupBy("user_id", "event_type", "pid").agg(
        F.min("ts").alias("valid_from"), F.count("*").alias("n_events")
    )
    wv = Window.partitionBy("user_id").orderBy("valid_from")
    valid_to = F.lead("valid_from").over(wv)
    return rolled.select(
        "user_id",
        "event_type",
        "valid_from",
        valid_to.alias("valid_to"),
        valid_to.isNull().cast("int").alias("is_current"),
        "n_events",
    )


_TWA_ORACLE = f"""
WITH timed AS (
  SELECT user_id, value,
         epoch_us(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
           - epoch_us(ts) AS dur_us
  FROM events
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_intervals,
       CAST(SUM(dur_us) AS BIGINT) AS total_us,
       {sql_round(
           "CAST(SUM(CAST(floor(value * 100.0 + 0.5) AS DECIMAL(38,0)) * dur_us) AS DOUBLE)"
           " / (100.0 * CAST(SUM(dur_us) AS DOUBLE))", 6)} AS twa_value
FROM timed
WHERE dur_us IS NOT NULL
GROUP BY user_id
"""


@query("time_weighted_avg", oracle=_TWA_ORACLE, tags=("W2", "A5", "timeseries"))
def time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of a sensor-style value per user — the
    irregular-sampling mean (TimescaleDB's ``time_weight``) where each
    reading holds until the next one. lead() pairs each reading with
    its duration; the weighted sum accumulates EXACT integer
    (value-cents x microseconds) products in DECIMAL(38,0), so the
    result is order-independent — the same fixed-point discipline as
    functions/rounding.py, extended to weighted measures. Each user's
    last reading has no duration and drops out, matching the
    left-closed integral."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    timed = (
        load(spark, sf_dir, "events")
        .select("user_id", "value", "ts", "event_id")
        .withColumn(
            "dur_us", F.unix_micros(F.lead("ts").over(w)) - F.unix_micros(F.col("ts"))
        )
        .filter(F.col("dur_us").isNotNull())
    )
    cents = to_units(F.col("value"), 2)
    return timed.groupBy("user_id").agg(
        F.count("*").alias("n_intervals"),
        F.sum("dur_us").alias("total_us"),
        round_to(
            F.sum(cents * F.col("dur_us")).cast("double")
            / (F.lit(100.0) * F.sum("dur_us").cast("double")),
            6,
        ).alias("twa_value"),
    )


GAP_MIN_MINUTES = 60

_GAPS_ORACLE = f"""
WITH timed AS (
  SELECT user_id,
         epoch_us(ts) - epoch_us(LAG(ts) OVER (PARTITION BY user_id
                                               ORDER BY ts, event_id)) AS gap_us
  FROM events
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_gaps,
       CAST(MAX(gap_us) AS BIGINT) AS max_gap_us,
       CAST(SUM(gap_us) AS BIGINT) AS total_silence_us
FROM timed
WHERE gap_us >= {GAP_MIN_MINUTES * 60 * 1_000_000}
GROUP BY user_id
"""


@query("silence_gap_audit", oracle=_GAPS_ORACLE, tags=("W1", "timeseries", "quality"))
def silence_gap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Missing-data audit: per user, the count, maximum, and total
    duration of silences of at least {GAP_MIN_MINUTES} minutes between
    consecutive events. The monitoring complement of sessionization
    (the same lag, aggregated over the gaps instead of the islands);
    all measures are integer microseconds, so the hash compare is
    exact by construction."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    return (
        load(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id")
        .withColumn("gap_us", gap_us)
        .filter(F.col("gap_us") >= GAP_MIN_MINUTES * 60 * 1_000_000)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_gaps"),
            F.max("gap_us").alias("max_gap_us"),
            F.sum("gap_us").alias("total_silence_us"),
        )
    )


_UPSERT_ORACLE = """
WITH ranked AS (
  SELECT user_id, event_type, value, ts,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT user_id,
       event_type AS last_type,
       value AS last_value,
       ts AS last_ts
FROM ranked
WHERE rn = 1
"""


@query("merge_upsert_latest", oracle=_UPSERT_ORACLE, tags=("W4", "cdc", "history"))
def merge_upsert_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-type-1 merge: the latest-wins snapshot a MERGE INTO /
    upsert sink converges to when a change stream is applied in order —
    computed in one pass as argmax per key (row_number over ts DESC
    with event_id as the deterministic tiebreak) instead of row-by-row
    merge application. This is the batch equivalence every CDC
    pipeline's compaction relies on: applying N updates per key ==
    keeping the newest. One shuffle on user_id; per-partition top-1 is
    heap-based, never a global sort (SCD-type-2, which keeps the full
    validity history instead of the last value, is scd2_type_periods)."""
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        load(spark, sf_dir, "events")
        .select("user_id", "event_type", "value", "ts", "event_id")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("last_type"),
            F.col("value").alias("last_value"),
            F.col("ts").alias("last_ts"),
        )
    )
