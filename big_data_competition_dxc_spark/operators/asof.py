"""As-of join and unpivot — operators Spark lacks natively, composed
from primitives it has (the brief's category (a): composition of
existing DataFrame ops, no UDF).

As-of join (each event matched to the same customer's LATEST order at
or before the event time) is THE time-series enrichment join. DuckDB
has it as a native ASOF JOIN — which makes it the oracle — while the
Spark composition is the classic union trick:

  tag order rows and event rows, union them, sort per customer by
  (time, tag), and carry the last seen order forward with
  last(..., ignorenulls=True) over an unbounded-preceding window;
  event rows then read the carried value.

One shuffle on the customer key, state is one row per customer during
the window scan — linear at 100 TB, vs the naive range-join + top-1
which materializes every (event, earlier-order) pair. Orders are
pre-deduplicated to one per (customer, date) so the match is unique
and both engines agree deterministically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.rounding import fixed_sum, sql_fixed_sum
from ..plans.registry import query
from ..sources import load


@query(
    "asof_join_latest_order",
    oracle="""
WITH ord AS (
  SELECT o_custkey, CAST(o_orderdate AS DATE) AS odate,
         MAX(o_orderkey) AS o_orderkey
  FROM orders GROUP BY 1, 2
),
ev AS (SELECT event_id, user_id, CAST(ts AS DATE) AS eds FROM events)
SELECT ev.event_id, ev.user_id,
       ord.o_orderkey AS latest_order,
       CAST(date_diff('day', ord.odate, ev.eds) AS BIGINT) AS days_since_order
FROM ev ASOF LEFT JOIN ord
  ON ev.user_id = ord.o_custkey AND ev.eds >= ord.odate
""",
    tags=("J7", "W1", "asof"),
)
def asof_join_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join via union + carry-forward window (no native Spark
    operator): each event enriched with the customer's most recent
    order on or before the event's date. NULL when no order precedes
    the event — exactly DuckDB's ASOF LEFT JOIN."""
    ord_rows = (
        load(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_custkey").alias("user_id"),
            F.to_date("o_orderdate").alias("t"),
        )
        .agg(F.max("o_orderkey").alias("o_orderkey"))
        .select(
            "user_id", "t", F.lit(0).alias("tag"),
            F.lit(None).cast("bigint").alias("event_id"), "o_orderkey",
        )
    )
    ev_rows = load(spark, sf_dir, "events").select(
        "user_id",
        F.to_date("ts").alias("t"),
        F.lit(1).alias("tag"),  # events sort AFTER same-day orders (>= semantics)
        "event_id",
        F.lit(None).cast("bigint").alias("o_orderkey"),
    )
    unioned = ord_rows.unionByName(ev_rows)
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "latest_order", F.last("o_orderkey", ignorenulls=True).over(w)
    ).withColumn(
        "latest_order_date",
        F.last(F.when(F.col("tag") == 0, F.col("t")), ignorenulls=True).over(w),
    )
    return (
        carried.filter(F.col("tag") == 1)
        .select(
            "event_id",
            "user_id",
            "latest_order",
            F.datediff(F.col("t"), F.col("latest_order_date"))
            .cast("bigint")
            .alias("days_since_order"),
        )
    )


@query(
    "unpivot_daily_measures",
    oracle=f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS ds,
         CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS DOUBLE) AS clicks,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS DOUBLE) AS purchases,
         {sql_fixed_sum('value', 2, 2)} AS total_value
  FROM events GROUP BY 1
)
SELECT ds, measure, val
FROM daily
UNPIVOT (val FOR measure IN (clicks, purchases, total_value))
""",
    tags=("A6", "array"),
)
def unpivot_daily_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt) — the inverse of A6's pivot: the wide daily
    measure columns back to long (ds, measure, value) form, the shape
    metric stores and plotting layers want. Narrow operation (an
    Expand node), no shuffle."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("ds")).agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("double")
        .alias("clicks"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("double")
        .alias("purchases"),
        fixed_sum(F.col("value"), 2, 2).alias("total_value"),
    )
    return daily.unpivot(
        ids=["ds"],
        values=["clicks", "purchases", "total_value"],
        variableColumnName="measure",
        valueColumnName="val",
    )
