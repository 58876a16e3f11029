"""Lag/lead features — the reference's signature move, both ways.

The reference emulates lag/lead with shifted-date self-joins
(流行音乐趋势预测.md:72-94, 288-293, 656-668, 968-993): copy the daily
table with ``date := date + n`` and left-join back, NULL -> 0. Window
``lag`` returns the previous EXISTING row instead — different semantics
on sparse dates (SURVEY §7.1). Both forms ship here, each pinned by its
own oracle; at scale the window form does one shuffle for all lag
columns vs one join (3 shuffles) per lag in the reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.rounding import fixed_sum, round_to, sql_fixed_sum
from ..plans.registry import query
from ..sources import load


def _daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(user, day) counts — the shared base (A1, M:68)."""
    return (
        load(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("ds"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            fixed_sum(F.col("value"), 2, 2).alias("total_value"),
        )
    )


_DAILY_CTE = f"""
daily AS (
  SELECT CAST(ts AS DATE) AS ds, user_id,
         COUNT(*) AS n_events,
         {sql_fixed_sum('value', 2, 2)} AS total_value
  FROM events GROUP BY 1, 2
)
"""


@query(
    "lag_shifted_join",
    oracle=f"""
WITH {_DAILY_CTE},
shifted AS (
  SELECT CAST(ds + INTERVAL 1 DAY AS DATE) AS ds, user_id,
         n_events AS prev_events
  FROM daily
)
SELECT d.ds, d.user_id, d.n_events, d.total_value,
       COALESCE(s.prev_events, 0) AS prev_events
FROM daily d LEFT JOIN shifted s USING (ds, user_id)
""",
    tags=("J7", "J2", "J5", "P1", "P13", "F1", "F13"),
)
def lag_shifted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7 exact reference semantics (M:72-94): shift the date key forward
    one day (F1 findYesterday), left-join back on the composite
    (date, entity) key (J2) keeping all columns unprojected (J5,
    M:1006), fill NULL with 0 (P13/F13, the replace("null","0") hack at
    M:299) — a missing prior CALENDAR day yields 0, not the last
    existing row. The renamed projection feeding the join is P1."""
    daily = _daily(spark, sf_dir)
    shifted = daily.select(
        F.date_add("ds", 1).alias("ds"),
        "user_id",
        F.col("n_events").alias("prev_events"),
    )
    return daily.join(shifted, ["ds", "user_id"], "left").na.fill({"prev_events": 0})


@query(
    "lag_window",
    oracle=f"""
WITH {_DAILY_CTE}
SELECT ds, user_id, n_events, total_value,
       COALESCE(LAG(n_events) OVER w, 0) AS prev_events,
       LEAD(n_events) OVER w AS next_events,
       (floor((total_value - COALESCE(LAG(total_value) OVER w, 0)) * 100.0 + 0.5) / 100.0) AS value_delta
FROM daily
WINDOW w AS (PARTITION BY user_id ORDER BY ds)
""",
    tags=("W1", "W2", "W3"),
)
def lag_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1/W2/W3 idiomatic form (SURVEY §2.5): one window per entity gives
    lag, lead AND day-over-day delta in a single shuffle — replacing three
    shifted-date joins (M:92-94, M:656-668, M:997-1001)."""
    daily = _daily(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ds")
    prev = F.coalesce(F.lag("n_events").over(w), F.lit(0).cast("bigint"))
    prev_val = F.coalesce(F.lag("total_value").over(w), F.lit(0.0))
    return (
        daily.withColumn("prev_events", prev)
        .withColumn("next_events", F.lead("n_events").over(w))
        .withColumn("value_delta", round_to(F.col("total_value") - prev_val, 2))
    )


@query(
    "rolling_7d_window",
    oracle=f"""
WITH {_DAILY_CTE}
SELECT ds, user_id, n_events,
       CAST(SUM(n_events) OVER (
         PARTITION BY user_id ORDER BY ds
         RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS events_7d
FROM daily
""",
    tags=("W1", "frame"),
)
def rolling_7d_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day sum via RANGE frame — the natural extension of the
    reference's 10/20/40-day point lookbacks (M:968-993, SURVEY §2.5).
    RANGE (not ROWS) so sparse dates aggregate the true calendar window."""
    daily = _daily(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_date("ds"))
        .rangeBetween(-6, Window.currentRow)
    )
    return daily.select(
        "ds", "user_id", "n_events", F.sum("n_events").over(w).alias("events_7d")
    )


@query(
    "lag_densified_window",
    oracle=f"""
WITH {_DAILY_CTE},
span AS (
  SELECT user_id, MIN(ds) AS d0, MAX(ds) AS d1 FROM daily GROUP BY user_id
),
calendar AS (
  SELECT user_id,
         CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS ds
  FROM span
),
dense AS (
  SELECT c.user_id, c.ds, COALESCE(d.n_events, 0) AS n_events
  FROM calendar c LEFT JOIN daily d USING (user_id, ds)
)
SELECT user_id, ds, CAST(n_events AS BIGINT) AS n_events,
       CAST(COALESCE(LAG(n_events) OVER (PARTITION BY user_id ORDER BY ds), 0)
            AS BIGINT) AS prev_events
FROM dense
""",
    tags=("J7", "W1", "array"),
)
def lag_densified_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The third road to exact lag-join parity (SURVEY §7.1): densify
    each user's calendar with sequence()+explode (zero rows for silent
    days), THEN take the window lag — a missing prior calendar day now
    correctly yields 0, like the reference's shifted-date join, while
    keeping the single-shuffle window form. This is the scale-preferred
    shape when lag-join semantics are required: the scaffold adds only
    (span-days x users) rows, vs one extra shuffle per lag column for
    the join emulation."""
    daily = _daily(spark, sf_dir)
    span = daily.groupBy("user_id").agg(
        F.min("ds").alias("d0"), F.max("ds").alias("d1")
    )
    calendar = span.select(
        "user_id",
        F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias("ds"),
    )
    dense = calendar.join(daily, ["user_id", "ds"], "left").select(
        "user_id", "ds", F.coalesce("n_events", F.lit(0)).cast("bigint").alias("n_events")
    )
    w = Window.partitionBy("user_id").orderBy("ds")
    return dense.withColumn(
        "prev_events",
        F.coalesce(F.lag("n_events").over(w), F.lit(0)).cast("bigint"),
    )


@query(
    "window_function_suite",
    oracle=f"""
WITH {_DAILY_CTE}
SELECT user_id, ds, CAST(n_events AS BIGINT) AS n_events,
       CAST(RANK() OVER w_desc AS BIGINT) AS rnk,
       CAST(DENSE_RANK() OVER w_desc AS BIGINT) AS drnk,
       CAST(NTILE(4) OVER w_asc AS INT) AS quartile,
       (floor((PERCENT_RANK() OVER w_desc) * 10000.0 + 0.5) / 10000.0) AS pct_rank,
       (floor((CUME_DIST() OVER w_desc) * 10000.0 + 0.5) / 10000.0) AS cume,
       CAST(FIRST_VALUE(n_events) OVER w_asc AS BIGINT) AS first_day_events,
       CAST(LAST_VALUE(n_events) OVER
            (PARTITION BY user_id ORDER BY ds
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
            AS BIGINT) AS last_day_events
FROM daily
WINDOW w_desc AS (PARTITION BY user_id ORDER BY n_events DESC, ds),
       w_asc  AS (PARTITION BY user_id ORDER BY ds)
""",
    tags=("W4", "O3"),
)
def window_function_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking-window surface in one query: rank/dense_rank/
    ntile/percent_rank/cume_dist over activity, first/last value over
    time — each with deterministic tie-break keys so both engines rank
    identically."""
    daily = _daily(spark, sf_dir)
    w_desc = Window.partitionBy("user_id").orderBy(F.desc("n_events"), F.asc("ds"))
    w_asc = Window.partitionBy("user_id").orderBy("ds")
    w_full = w_asc.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return daily.select(
        "user_id",
        "ds",
        F.col("n_events").cast("bigint").alias("n_events"),
        F.rank().over(w_desc).cast("bigint").alias("rnk"),
        F.dense_rank().over(w_desc).cast("bigint").alias("drnk"),
        F.ntile(4).over(w_asc).cast("int").alias("quartile"),
        round_to(F.percent_rank().over(w_desc), 4).alias("pct_rank"),
        round_to(F.cume_dist().over(w_desc), 4).alias("cume"),
        F.first("n_events").over(w_asc).cast("bigint").alias("first_day_events"),
        F.last("n_events").over(w_full).cast("bigint").alias("last_day_events"),
    )
