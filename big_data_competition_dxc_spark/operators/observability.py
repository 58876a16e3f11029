"""observe(): pipeline metrics without a second scan (SURVEY §4 —
the reference re-ran a full aggregate whenever it wanted a row count
or checksum of an intermediate, doubling every scan it instrumented).

``df.observe(Observation, <aggs>)`` attaches accumulator-backed
aggregates to a plan node: the metrics are collected AS A SIDE EFFECT
of whatever action executes the plan — zero extra jobs, zero extra
scans, which at 100 TB is the difference between monitoring being free
and monitoring doubling the bill. The observed sum uses the same exact
integer-unit trick as fixed_sum, so the metric is deterministic and the
query carries a full DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import round_to, sql_fixed_sum, to_units
from ..plans.registry import query
from ..sources import load


@query(
    "observe_scan_metrics",
    oracle=f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
       {sql_fixed_sum('value', 2, 2)} AS total_value
FROM events
""",
    tags=("observe", "A9"),
)
def observe_scan_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run a real downstream aggregation (per-day rollup) with an
    Observation riding the events scan; the returned row is the
    OBSERVED metrics — harvested from the action that computed the
    rollup, not from a second pass over events. (n_days comes from the
    rollup's own result size, demonstrating both harvest paths.)"""
    obs = Observation("scan_metrics")
    ev = load(spark, sf_dir, "events").observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(to_units(F.col("value"), 2)).alias("value_units"),
    )
    daily = ev.groupBy(F.to_date("ts").alias("ds")).agg(
        F.count("*").alias("n_events")
    )
    n_days = daily.count()  # the ONLY action: executes rollup + metrics
    m = obs.get
    return spark.range(1).select(
        F.lit(int(m["n_rows"])).cast("bigint").alias("n_rows"),
        F.lit(int(n_days)).cast("bigint").alias("n_days"),
        round_to(F.lit(int(m["value_units"])) / F.lit(100.0), 2).alias("total_value"),
    )
