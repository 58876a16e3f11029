"""Watermark-lateness audit: the batch analysis that SIZES watermarks.

Every watermark in this engine (1 hour on the streams in
streaming/*.py) is a claim about the source's out-of-orderness; this
operator measures it. The fixture carries no ingest timestamp and its
event_id order IS event-time order (measured: zero lateness), so the
audit models the regime watermarks exist for — an at-least-once
ingest that reorders within a bounded window — with a DETERMINISTIC
arrival jitter: arrival key = event_id + md5(event_id) % JITTER (an
event can arrive up to JITTER-1 positions late; on a real source you
use the ingest offset instead and delete the jitter line). The
watermark frontier after each arrival is the running MAX of event
time over everything arrived before it; an event's lateness is
frontier - its own event time — exactly the quantity a
``withWatermark(delay)`` must exceed to retain the event. The audit
buckets lateness into powers-of-two minutes and reports cumulative
retained permille per candidate delay — the table you read to pick a
delay.

Cross-engine exactness: lateness is integer microseconds floor-divided
to seconds on BOTH engines (DuckDB date_diff counts boundary
crossings, which disagrees with the floor at sub-second offsets — so
neither side uses it); the permille column is integer floor-div.

One window over arrival order + one small aggregate — the same scan
cost as any lag feature. At 100 TB you run it per ingest shard
(PARTITION BY source partition) because out-of-orderness is a
per-source property; the global frontier is the fixture-scale
equivalent. The streaming modules' "1 hour" is validated by this
query's output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import sql_md5_bigint
from ..plans.registry import query
from ..sources import load

BUCKET_MINUTES = (1, 5, 15, 30, 60, 120, 240)  # candidate watermark delays
OVERFLOW = 9999  # sorts after every real bucket: "no finite candidate retains"
JITTER = 41  # arrival displacement bound (positions), deterministic via md5


def _bucket_sql(lateness: str) -> str:
    branches = " ".join(
        f"WHEN {lateness} <= {m * 60} THEN {m}" for m in BUCKET_MINUTES
    )
    return f"CASE WHEN {lateness} <= 0 THEN 0 {branches} ELSE {OVERFLOW} END"


@query(
    "watermark_lateness_audit",
    oracle=f"""
WITH ord AS (
  SELECT event_id, ts,
         event_id + {sql_md5_bigint("CAST(event_id AS VARCHAR)")}
                    % {JITTER} AS ak
  FROM events
),
arr AS (
  SELECT event_id, ts,
         MAX(ts) OVER (ORDER BY ak, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS frontier
  FROM ord
),
lat AS (
  SELECT CAST(CASE WHEN frontier IS NULL THEN 0
              ELSE GREATEST(0, (epoch_us(frontier) - epoch_us(ts)) // 1000000)
              END AS BIGINT) AS late_s
  FROM arr
),
b AS (
  SELECT {_bucket_sql("late_s")} AS le_minutes, COUNT(*) AS n
  FROM lat GROUP BY 1
),
t AS (SELECT SUM(n) AS total FROM b)
SELECT CAST(le_minutes AS BIGINT) AS le_minutes,
       CAST(n AS BIGINT) AS n_events,
       CAST((SUM(n) OVER (ORDER BY le_minutes) * 1000)
            // (SELECT total FROM t) AS BIGINT) AS retained_pm
FROM b
""",
    tags=("streaming", "W1", "A1"),
)
def watermark_lateness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateness distribution vs the arrival-order watermark frontier:
    per power-of-two-minutes bucket, how many events are that late and
    what cumulative fraction (permille) a watermark of that delay
    would retain. {OVERFLOW} catches anything later than the largest
    candidate (sorting after every real bucket, so the cumulative
    column stays monotone)."""
    from ..functions.hashing import md5_bigint

    ev = load(spark, sf_dir, "events").select(
        "event_id",
        "ts",
        (
            F.col("event_id")
            + md5_bigint(F.col("event_id").cast("string"), 15) % JITTER
        ).alias("ak"),
    )
    w = Window.orderBy("ak", "event_id").rowsBetween(Window.unboundedPreceding, -1)
    frontier = F.max("ts").over(w)
    lat = ev.select(
        F.when(frontier.isNull(), F.lit(0).cast("bigint"))
        .otherwise(
            F.greatest(
                F.lit(0).cast("bigint"),
                F.expr(
                    "(unix_micros(max(ts) OVER (ORDER BY ak, event_id "
                    "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)) "
                    "- unix_micros(ts)) div 1000000"
                ),
            )
        )
        .alias("late_s")
    )
    b = lat.groupBy(
        F.expr(_bucket_sql("late_s")).cast("bigint").alias("le_minutes")
    ).agg(F.count("*").alias("n_events"))
    total = b.agg(F.sum("n_events")).collect()[0][0]
    return b.withColumn(
        "retained_pm",
        F.expr(f"(sum(n_events) OVER (ORDER BY le_minutes "
               f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 1000) "
               f"div {total}").cast("bigint"),
    )
