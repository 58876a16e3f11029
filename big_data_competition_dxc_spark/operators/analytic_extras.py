"""Central-tendency analytics the reference reaches for ad hoc:
per-group MODE (most frequent categorical) and exact MEDIAN.

The reference computes "most played song per segment"-style modal picks
with sort-by-count driver code (流行音乐趋势预测.md's ranked frequency
blocks) and never has a median primitive at all. Here both are one
declarative plan each:

- MODE is NOT Spark's ``F.mode``: the built-in (like DuckDB's
  ``mode()``) breaks frequency ties in an unspecified order, which a
  hash-compared oracle cannot tolerate. The deterministic form is the
  classic two-level aggregate — count per (group, value), then
  row_number over (count DESC, value ASC) — identical logic on both
  engines, so ties resolve to the lexicographically smallest value
  everywhere.
- MEDIAN is the exact interpolated percentile (Spark ``F.median`` ==
  SQL PERCENTILE_CONT(0.5) == DuckDB ``quantile_cont``): sort-based and
  deterministic, unlike SUM(double) accumulation order.

100 TB: the modal pass is two hash aggregations on progressively
smaller keyspaces (group x value, then group) — linear, no skew
hazard beyond the group key itself. Exact median requires a sort per
group; the documented at-scale swap is ``approx_percentile(col, 0.5,
accuracy)`` (one pass, bounded memory, rank error <= 1/accuracy),
traded off exactly like percentile_prices (operators/aggregates.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.rounding import round_to, sql_round
from ..plans.registry import query
from ..sources import load

_MODE_MEDIAN_ORACLE = f"""
WITH counts AS (
  SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
  FROM orders
  GROUP BY 1, 2
), modal AS (
  SELECT o_orderstatus, o_orderpriority AS modal_priority
  FROM (
    SELECT o_orderstatus, o_orderpriority,
           ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                              ORDER BY n DESC, o_orderpriority) AS rn
    FROM counts
  )
  WHERE rn = 1
)
SELECT o.o_orderstatus,
       m.modal_priority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       {sql_round("quantile_cont(o.o_totalprice, 0.5)", 4)} AS median_price
FROM orders o
JOIN modal m ON o.o_orderstatus = m.o_orderstatus
GROUP BY 1, 2
"""


@query("mode_median_stats", oracle=_MODE_MEDIAN_ORACLE, tags=("A5", "A11", "analytic"))
def mode_median_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per order status: the deterministic modal order priority (ties ->
    lexicographically smallest) and the exact median total price."""
    orders = load(spark, sf_dir, "orders")
    counts = orders.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n")
    )
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.desc("n"), F.asc("o_orderpriority")
    )
    modal = (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_orderstatus", F.col("o_orderpriority").alias("modal_priority"))
    )
    stats = orders.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        round_to(F.median("o_totalprice"), 4).alias("median_price"),
    )
    return stats.join(F.broadcast(modal), "o_orderstatus").select(
        "o_orderstatus", "modal_priority", "n_orders", "median_price"
    )
