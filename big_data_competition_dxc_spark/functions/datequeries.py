"""Oracle-checked queries exercising the date function library
(functions/dates.py — the reference's Convert object, SURVEY §2.8 F1–F10)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources import load
from .dates import ORACLE_DAYOFWEEK, day_of_week, shift_days, to_ds


@query(
    "date_shift_library",
    oracle=f"""
WITH d AS (SELECT DISTINCT CAST(o_orderdate AS DATE) AS ds FROM orders)
SELECT ds,
       CAST(ds + INTERVAL 1 DAY AS DATE) AS next_day,
       CAST(ds + INTERVAL 10 DAY AS DATE) AS plus_10d,
       CAST(ds + INTERVAL 40 DAY AS DATE) AS plus_40d,
       CAST(ds - INTERVAL 30 DAY AS DATE) AS minus_30d,
       {ORACLE_DAYOFWEEK.format(col="ds")} AS dow,
       CAST(datediff('day', DATE '1995-01-01', ds) AS INT) AS age_days,
       strftime(ds, '%Y%m%d') AS ds_str
FROM d
""",
    tags=("F1", "F2", "F3", "F4", "F5", "F8"),
)
def date_shift_library(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1–F5, F8 (M:54-62, M:804-872, M:902-906): every Convert-object
    date shift as a builtin expression over the distinct order dates.
    ds_str round-trips the reference's native yyyyMMdd encoding."""
    d = (
        load(spark, sf_dir, "orders")
        .select(F.to_date("o_orderdate").alias("ds"))
        .distinct()
    )
    return d.select(
        "ds",
        shift_days("ds", 1).alias("next_day"),
        shift_days("ds", 10).alias("plus_10d"),
        shift_days("ds", 40).alias("plus_40d"),
        shift_days("ds", -30).alias("minus_30d"),
        day_of_week("ds").alias("dow"),
        F.datediff(F.col("ds"), F.lit("1995-01-01").cast("date")).alias("age_days"),
        to_ds("ds").alias("ds_str"),
    )


@query(
    "epoch_roundtrip",
    oracle="""
SELECT hour(ts) AS hr,
       COUNT(*) AS n_events,
       MIN(CAST(floor(epoch(ts)) AS BIGINT)) AS min_epoch_s,
       MAX(CAST(floor(epoch(ts)) AS BIGINT)) AS max_epoch_s
FROM events
GROUP BY 1
""",
    tags=("F6", "F7"),
)
def epoch_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6/F7 (M:885-897): timestamp <-> epoch-seconds conversions plus the
    hour extraction the reference substrings out of a formatted date."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy(F.hour("ts").alias("hr")).agg(
        F.count("*").alias("n_events"),
        F.min(F.unix_timestamp("ts")).alias("min_epoch_s"),
        F.max(F.unix_timestamp("ts")).alias("max_epoch_s"),
    )


@query(
    "calendar_parts_library",
    oracle="""
WITH d AS (SELECT DISTINCT CAST(o_orderdate AS DATE) AS ds FROM orders)
SELECT ds,
       CAST(quarter(ds) AS INT) AS qtr,
       CAST(weekofyear(ds) AS INT) AS iso_week,
       CAST(dayofyear(ds) AS INT) AS doy,
       CAST(last_day(ds) AS DATE) AS month_end,
       CAST(date_trunc('quarter', ds) AS DATE) AS qtr_start,
       CAST(date_trunc('week', ds) AS DATE) AS week_start
FROM d
""",
    tags=("F5", "F9", "calendar"),
)
def calendar_parts_library(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The calendar-part surface beyond day arithmetic: quarter, ISO
    week number (both engines follow ISO-8601 here, unlike dayofweek's
    Sunday-origin mismatch), day-of-year, month end, and quarter/week
    truncation — the fiscal-rollup building blocks. All pure builtins
    over the distinct date list; constant-foldable and pushdown-safe."""
    d = (
        load(spark, sf_dir, "orders")
        .select(F.col("o_orderdate").cast("date").alias("ds"))
        .distinct()
    )
    return d.select(
        "ds",
        F.quarter("ds").alias("qtr"),
        F.weekofyear("ds").alias("iso_week"),
        F.dayofyear("ds").alias("doy"),
        F.last_day("ds").alias("month_end"),
        F.to_date(F.date_trunc("quarter", "ds")).alias("qtr_start"),
        F.to_date(F.date_trunc("week", "ds")).alias("week_start"),
    )
