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


_ROLLMED_ORACLE = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS ds, user_id, COUNT(*) AS n_events
  FROM events GROUP BY 1, 2
)
SELECT user_id, ds,
       CAST(n_events AS BIGINT) AS n_events,
       {sql_round(
           "quantile_cont(n_events, 0.5) OVER ("
           "PARTITION BY user_id ORDER BY ds "
           "ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)", 4)} AS med7
FROM daily
"""


@query("rolling_median_7d", oracle=_ROLLMED_ORACLE, tags=("W1", "A9", "analytic"))
def rolling_median_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-row exact median of each user's daily event count —
    the robust trend line a mean-based rolling window (rolling_7d_window)
    distorts under spikes. Spark refuses percentile aggregates over an
    ordered frame (INVALID_WINDOW_SPEC_FOR_AGGREGATION_FUNC), so the
    frame's values are collected (<= 7 elements — bounded, cheap),
    sorted, and interpolated explicitly with PERCENTILE_CONT's
    midpoint rule; sort-based and deterministic, so hash-comparable.
    100 TB: one shuffle on user_id; per-partition frames are tiny."""
    from ..operators.lags import _daily

    w = (
        Window.partitionBy("user_id")
        .orderBy("ds")
        .rowsBetween(-6, Window.currentRow)
    )
    arr = F.sort_array(F.collect_list("n_events").over(w))
    n = F.size(arr)
    mid_lo = F.element_at(arr, F.floor((n + F.lit(1)) / F.lit(2.0)).cast("int"))
    mid_hi = F.element_at(arr, F.ceil((n + F.lit(1)) / F.lit(2.0)).cast("int"))
    med = (mid_lo + mid_hi) / F.lit(2.0)
    return (
        _daily(spark, sf_dir)
        .select(
            "user_id",
            "ds",
            F.col("n_events").cast("bigint").alias("n_events"),
            round_to(med, 4).alias("med7"),
        )
    )


N_FOLDS = 5

_KFOLD_ORACLE = f"""
WITH folded AS (
  SELECT ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT
           % {N_FOLDS} AS fold
  FROM events
)
SELECT fold,
       CAST(COUNT(*) AS BIGINT) AS n_test,
       CAST(SUM(COUNT(*)) OVER () - COUNT(*) AS BIGINT) AS n_train,
       {sql_round(
           "CAST(COUNT(*) AS DOUBLE) / CAST(SUM(COUNT(*)) OVER () AS DOUBLE)",
           4)} AS test_frac
FROM folded
GROUP BY fold
"""


@query("kfold_split_audit", oracle=_KFOLD_ORACLE, tags=("U4", "sampling", "ml"))
def kfold_split_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic {N_FOLDS}-fold cross-validation assignment
    (fold = md5(event_id) mod k — engine-portable, seed-free, and
    reproducible on any cluster size, unlike randomSplit) audited per
    fold: test size, complementary train size, and realized test
    fraction. Folds partition the input by construction (every row
    lands in exactly one residue class), so train/test disjointness
    needs no pairwise check."""
    from ..functions.hashing import md5_bigint

    ev = load(spark, sf_dir, "events")
    folded = ev.select(
        (md5_bigint(F.col("event_id").cast("string")) % N_FOLDS).alias("fold")
    )
    counts = folded.groupBy("fold").agg(F.count("*").alias("n_test"))
    w_all = Window.partitionBy()
    total = F.sum("n_test").over(w_all)
    return counts.select(
        "fold",
        "n_test",
        (total - F.col("n_test")).cast("bigint").alias("n_train"),
        round_to(F.col("n_test").cast("double") / total.cast("double"), 4).alias(
            "test_frac"
        ),
    )
