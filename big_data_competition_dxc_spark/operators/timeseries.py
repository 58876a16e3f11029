"""Time-series operators: range join, hierarchical (hypertable-style)
rollup, and a Count-Min sketch — the remaining custom-operator examples
from the brief, all as compositions of built-in DataFrame ops.

Scale notes: the range join anchors on the customer equi-key, so the
band predicate is a post-join filter, never a cross product. The
hierarchical rollup RE-AGGREGATES from partials (hour -> day -> month),
the continuous-aggregate trick: each coarser resolution reads the
finer aggregate (tiny), not the raw events — at 100 TB the raw scan
happens once. The Count-Min sketch is (depth x width) counters built
with one groupBy — mergeable across partitions/days by summing
counters, which is why it works as a streaming/distributed sketch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import md5_bigint, sql_md5_bigint
from ..functions.rounding import round_to
from ..plans.registry import query
from ..sources import load

RANGE_DAYS = 7


@query(
    "range_join_post_order_events",
    oracle=f"""
SELECT o.o_orderkey, o.o_custkey,
       CAST(COUNT(e.event_id) AS BIGINT) AS n_events_week_after
FROM orders o
LEFT JOIN events e
  ON e.user_id = o.o_custkey
 AND CAST(e.ts AS DATE) >= CAST(o.o_orderdate AS DATE)
 AND CAST(e.ts AS DATE) <= CAST(o.o_orderdate AS DATE) + INTERVAL {RANGE_DAYS} DAY
GROUP BY 1, 2
""",
    tags=("J3", "P3", "range-join"),
)
def range_join_post_order_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (band) join anchored on an equi-key: events within
    {RANGE_DAYS} days after each order by the same customer. The
    customer key hashes the join; the date band is a cheap post-join
    filter — the composition that keeps a range join linear instead of
    quadratic."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.to_date("o_orderdate").alias("odate")
    )
    e = load(spark, sf_dir, "events").select(
        "event_id", "user_id", F.to_date("ts").alias("eds")
    )
    joined = o.join(
        e,
        (o.o_custkey == e.user_id)
        & (e.eds >= o.odate)
        & (e.eds <= F.date_add(o.odate, RANGE_DAYS)),
        "left",
    )
    return joined.groupBy("o_orderkey", "o_custkey").agg(
        F.count("event_id").alias("n_events_week_after")
    )


@query(
    "hypertable_rollup_chain",
    oracle=f"""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS bucket, COUNT(*) AS n,
         SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS v
  FROM events GROUP BY 1
),
daily AS (
  SELECT date_trunc('day', bucket) AS bucket, SUM(n) AS n, SUM(v) AS v
  FROM hourly GROUP BY 1
),
monthly AS (
  SELECT date_trunc('month', bucket) AS bucket, SUM(n) AS n, SUM(v) AS v
  FROM daily GROUP BY 1
)
SELECT 'hour' AS resolution, CAST(COUNT(*) AS BIGINT) AS n_buckets,
       CAST(SUM(n) AS BIGINT) AS total_events,
       CAST(SUM(v) AS BIGINT) AS total_value_cents
FROM hourly
UNION ALL
SELECT 'day', CAST(COUNT(*) AS BIGINT), CAST(SUM(n) AS BIGINT), CAST(SUM(v) AS BIGINT)
FROM daily
UNION ALL
SELECT 'month', CAST(COUNT(*) AS BIGINT), CAST(SUM(n) AS BIGINT), CAST(SUM(v) AS BIGINT)
FROM monthly
""",
    tags=("A2", "hypertable"),
)
def hypertable_rollup_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate chain: hour buckets from
    raw events, DAY buckets re-aggregated from the hourly partials,
    MONTH from the daily — the raw table is scanned exactly once and
    each coarser resolution aggregates the (much smaller) finer one.
    Totals must be identical at every resolution (the oracle checks all
    three). Values accumulate as EXACT integer cents — the
    order-independent form that guarantees hour/day/month totals agree
    bit-for-bit however the partials are merged (see supplier_rollup
    for the double-sum boundary this avoids)."""
    ev = load(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100.0 + 0.5).cast("bigint")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("bucket")).agg(
        F.count("*").alias("n"), F.sum(cents).alias("v")
    )
    daily = hourly.groupBy(F.date_trunc("day", "bucket").alias("bucket")).agg(
        F.sum("n").alias("n"), F.sum("v").alias("v")
    )
    monthly = daily.groupBy(F.date_trunc("month", "bucket").alias("bucket")).agg(
        F.sum("n").alias("n"), F.sum("v").alias("v")
    )

    def level(df: DataFrame, name: str) -> DataFrame:
        return df.agg(
            F.lit(name).alias("resolution"),
            F.count("*").alias("n_buckets"),
            F.sum("n").cast("bigint").alias("total_events"),
            F.sum("v").cast("bigint").alias("total_value_cents"),
        )

    return level(hourly, "hour").unionByName(level(daily, "day")).unionByName(
        level(monthly, "month")
    )


CMS_DEPTH = 4
CMS_WIDTH = 64


@query(
    "countmin_heavy_hitters",
    oracle=f"""
WITH rows_ AS (
  SELECT user_id,
         d,
         ({sql_md5_bigint("CAST(d AS VARCHAR) || ':' || CAST(user_id AS VARCHAR)", 12)})
           % {CMS_WIDTH} AS bucket
  FROM events, unnest(range(0, {CMS_DEPTH})) AS t(d)
),
sketch AS (
  SELECT d, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM rows_ GROUP BY 1, 2
),
exact AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_exact
  FROM events GROUP BY 1 ORDER BY n_exact DESC, user_id LIMIT 10
),
probes AS (
  SELECT e.user_id, e.n_exact, s.d, s.cnt
  FROM exact e
  JOIN sketch s
    ON s.d IN (SELECT unnest(range(0, {CMS_DEPTH})))
   AND s.bucket = ({sql_md5_bigint("CAST(s.d AS VARCHAR) || ':' || CAST(e.user_id AS VARCHAR)", 12)})
         % {CMS_WIDTH}
)
SELECT user_id, n_exact, CAST(MIN(cnt) AS BIGINT) AS n_estimate
FROM probes GROUP BY 1, 2
""",
    tags=("A8", "sketch"),
)
def countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch as relational ops: {CMS_DEPTH} md5-derived hash
    rows x {CMS_WIDTH} buckets, one groupBy to build, point queries =
    min over the key's {CMS_DEPTH} counters. Estimates for the top-10
    exact heavy hitters; CMS guarantees estimate >= exact (checked by
    the oracle producing identical numbers — the sketch is fully
    deterministic, so even its OVER-estimates agree across engines)."""
    ev = load(spark, sf_dir, "events").select("user_id")
    d = F.explode(F.sequence(F.lit(0), F.lit(CMS_DEPTH - 1))).alias("d")
    keyed = ev.select("user_id", d).withColumn(
        "bucket",
        md5_bigint(
            F.concat_ws(":", F.col("d").cast("string"), F.col("user_id").cast("string")),
            12,
        )
        % CMS_WIDTH,
    )
    sketch = keyed.groupBy("d", "bucket").agg(F.count("*").alias("cnt"))

    exact = (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("n_exact"))
        .orderBy(F.desc("n_exact"), F.asc("user_id"))
        .limit(10)
    )
    probes = exact.select(
        "user_id", "n_exact", F.explode(F.sequence(F.lit(0), F.lit(CMS_DEPTH - 1))).alias("d")
    ).withColumn(
        "bucket",
        md5_bigint(
            F.concat_ws(":", F.col("d").cast("string"), F.col("user_id").cast("string")),
            12,
        )
        % CMS_WIDTH,
    )
    return (
        probes.join(F.broadcast(sketch), ["d", "bucket"])
        .groupBy("user_id", "n_exact")
        .agg(F.min("cnt").alias("n_estimate"))
    )


BURST_VALUE_MIN = 330.0
BURST_HOURS = 2


@query(
    "interval_join_binned",
    oracle=f"""
WITH w AS (
  SELECT event_id AS window_id, ts AS w_start,
         ts + INTERVAL {BURST_HOURS} HOUR AS w_end
  FROM events WHERE event_type = 'error' AND value > {BURST_VALUE_MIN}
),
wb AS (
  SELECT window_id, w_start, w_end,
         unnest(generate_series(date_trunc('hour', w_start),
                                date_trunc('hour', w_end),
                                INTERVAL 1 HOUR)) AS bin
  FROM w
),
ev AS (
  SELECT event_id, user_id, ts, date_trunc('hour', ts) AS bin FROM events
)
SELECT window_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM wb JOIN ev USING (bin)
WHERE ev.ts >= w_start AND ev.ts < w_end AND ev.event_id != window_id
GROUP BY window_id
""",
    tags=("range-join", "J3", "binned"),
)
def interval_join_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join with NO equi-key — the case the key-anchored range
    join above can't cover: every event falling inside ANY error-burst
    window [ts, ts+{BURST_HOURS}h) of a high-value error. Naively this
    is a cross join with a band predicate (quadratic); binning makes it
    an equi-join: each window explodes into the hour bins it covers
    (≤{BURST_HOURS}+1 rows), each event maps to exactly one bin, the
    join key is the bin, and the band predicate is a residual filter.
    An event meets a window in exactly one bin (the event's own), so no
    dedup pass is needed. At 100 TB the bin is the shuffle key — hot
    hours skew-split by AQE; bin width trades fanout (wider = fewer
    window rows) against join selectivity (narrower = fewer false
    bin-mates), the same knob as Databricks' range-join bin hints."""
    e = load(spark, sf_dir, "events")
    w = e.filter(
        (F.col("event_type") == "error") & (F.col("value") > BURST_VALUE_MIN)
    ).select(
        F.col("event_id").alias("window_id"),
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr(f"INTERVAL {BURST_HOURS} HOURS")).alias("w_end"),
    )
    wb = w.select(
        "window_id",
        "w_start",
        "w_end",
        F.explode(
            F.sequence(
                F.date_trunc("hour", "w_start"),
                F.date_trunc("hour", "w_end"),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("bin"),
    )
    ev = e.select(
        "event_id", "user_id", "ts", F.date_trunc("hour", "ts").alias("bin")
    )
    return (
        wb.join(ev, "bin")
        .filter(
            (F.col("ts") >= F.col("w_start"))
            & (F.col("ts") < F.col("w_end"))
            & (F.col("event_id") != F.col("window_id"))
        )
        .groupBy("window_id")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


_INTERP_ORACLE = """
WITH span AS (
  SELECT user_id,
         date_trunc('hour', MIN(ts)) AS h0,
         date_trunc('hour', MAX(ts)) AS h1
  FROM events GROUP BY 1
),
grid AS (
  SELECT user_id,
         unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS ts,
         CAST(NULL AS DOUBLE) AS value, 1 AS is_grid
  FROM span
),
merged AS (
  SELECT user_id, ts, value, is_grid FROM grid
  UNION ALL
  SELECT user_id, ts, value, 0 AS is_grid FROM events
),
bracketed AS (
  SELECT user_id, ts, value, is_grid,
         LAST_VALUE(value IGNORE NULLS) OVER
           (PARTITION BY user_id ORDER BY ts, is_grid
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_val,
         LAST_VALUE(CASE WHEN value IS NOT NULL THEN epoch_us(ts) END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, is_grid
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_us,
         FIRST_VALUE(value IGNORE NULLS) OVER
           (PARTITION BY user_id ORDER BY ts, is_grid
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_val,
         FIRST_VALUE(CASE WHEN value IS NOT NULL THEN epoch_us(ts) END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, is_grid
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_us
  FROM merged
)
SELECT user_id, ts,
       (floor((CASE
          WHEN prev_val IS NULL THEN next_val
          WHEN next_val IS NULL THEN prev_val
          WHEN next_us = prev_us THEN prev_val
          ELSE prev_val + (next_val - prev_val)
               * (CAST(epoch_us(ts) - prev_us AS DOUBLE)
                  / CAST(next_us - prev_us AS DOUBLE))
        END) * 1000000.0 + 0.5) / 1000000.0) AS value_interp
FROM bracketed
WHERE is_grid = 1
"""


@query("linear_interpolate_hourly", oracle=_INTERP_ORACLE, tags=("W1", "timeseries", "gapfill"))
def linear_interpolate_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample each user's irregular readings onto an hourly grid with
    LINEAR interpolation (the gap-fill beyond lag_densified_window's
    zero-fill and LOCF): union the generated spine with the raw
    readings, bracket every grid point with its nearest reading on
    each side via IGNORE-NULLS running first/last — one user_id
    shuffle, no self-join, no per-gap explode — then blend by the
    microsecond-exact time fraction. Edges fall back to the nearest
    reading (bfill/ffill). ``is_grid`` breaks ts ties so a reading
    coinciding with a grid point deterministically brackets it on both
    engines; the blend arithmetic is the same IEEE expression on both
    sides, so 6dp rounding is stable."""
    ev = load(spark, sf_dir, "events").select("user_id", "ts", "value")
    span = ev.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    grid = span.select(
        "user_id",
        F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("ts"),
        F.lit(None).cast("double").alias("value"),
        F.lit(1).alias("is_grid"),
    )
    merged = grid.unionAll(ev.withColumn("is_grid", F.lit(0)))
    wb = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_grid")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_grid")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    reading_us = F.when(
        F.col("value").isNotNull(), F.unix_micros(F.col("ts"))
    )
    bracketed = (
        merged.withColumn("prev_val", F.last("value", ignorenulls=True).over(wb))
        .withColumn("prev_us", F.last(reading_us, ignorenulls=True).over(wb))
        .withColumn("next_val", F.first("value", ignorenulls=True).over(wf))
        .withColumn("next_us", F.first(reading_us, ignorenulls=True).over(wf))
    )
    frac = (F.unix_micros(F.col("ts")) - F.col("prev_us")).cast("double") / (
        F.col("next_us") - F.col("prev_us")
    ).cast("double")
    interp = (
        F.when(F.col("prev_val").isNull(), F.col("next_val"))
        .when(F.col("next_val").isNull(), F.col("prev_val"))
        .when(F.col("next_us") == F.col("prev_us"), F.col("prev_val"))
        .otherwise(F.col("prev_val") + (F.col("next_val") - F.col("prev_val")) * frac)
    )
    return bracketed.filter(F.col("is_grid") == 1).select(
        "user_id", "ts", round_to(interp, 6).alias("value_interp")
    )


_LOCF_ORACLE = """
WITH readings AS (
  SELECT user_id, event_id, ts,
         CASE WHEN event_type <> 'error' THEN value END AS reading
  FROM events
)
SELECT user_id, event_id,
       CAST(reading IS NULL AS INT) AS is_gap,
       last_value(reading IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS value_filled
FROM readings
"""


@query("locf_gap_fill", oracle=_LOCF_ORACLE, tags=("W1", "timeseries"))
def locf_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-observation-carried-forward: error events carry no reading
    (their value is semantically a gap), so each row takes the user's
    most recent non-gap value — the standard sensor forward-fill,
    complementing linear_interpolate_hourly's midpoint estimate. The
    fill is a copy of an input double (no arithmetic), so it is
    hash-exact without rounding; leading gaps before any reading stay
    NULL in both engines. One shuffle on user_id; running state is a
    single value per partition."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    reading = F.when(F.col("event_type") != "error", F.col("value"))
    return (
        load(spark, sf_dir, "events")
        .select("user_id", "event_id", "ts", reading.alias("reading"))
        .select(
            "user_id",
            "event_id",
            F.col("reading").isNull().cast("int").alias("is_gap"),
            F.last("reading", ignorenulls=True).over(w).alias("value_filled"),
        )
    )
