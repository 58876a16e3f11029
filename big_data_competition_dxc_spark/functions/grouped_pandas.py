"""Batch applyInPandas (grouped-map Pandas UDF) — per-user OLS trend.

Completes the Pandas-API matrix: mapInPandas (multimodal/binary_ops),
scalar pandas_udf (similarity/pandas_path), applyInPandasWithState
(streaming/stateful) — and now the batch grouped-map seam, where each
group arrives as ONE pandas DataFrame. The fixture op: each user's
activity-value trend as an OLS slope over time.

The slope is SQL-expressible (that is exactly what makes the oracle
strong); the UDF exists to pin the applyInPandas seam against it.
Determinism discipline: Spark prepares exact integer inputs (x =
epoch seconds via integer division of micros, y = exact cents), the
UDF accumulates Python arbitrary-precision ints (never numpy float
sums), and the single float division mirrors the oracle's
CAST(num AS DOUBLE)/CAST(den AS DOUBLE) via float(num)/float(den) —
bit-identical even where num/den exceed 2^53, where Python's exact
rational division would differ in the last ulp. x is centered per
group (slope-invariant) to keep x² sums small.

Scale notes (100 TB): one shuffle on user_id; each group is one Arrow
batch (bounded by events-per-user — for power-law entities, pre-split
hot keys or fall back to the pure-SQL covariance form, which is one
hash aggregate with no Python at all).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import sql_round
from ..plans.registry import query
from ..sources import load

OUT_SCHEMA = "user_id bigint, n_points bigint, slope_per_hour double"


def _ols_slope(pdf):
    import pandas as pd

    xs = [int(v) for v in pdf["x"]]
    ys = [int(v) for v in pdf["y"]]
    x0 = min(xs)
    xs = [x - x0 for x in xs]
    n = len(xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sx = sum(xs)
    sy = sum(ys)
    sxx = sum(x * x for x in xs)
    den = n * sxx - sx * sx
    if den == 0:
        slope = None
    else:
        # cents/second -> currency-units/hour is *3600/100 = *36;
        # float() mirrors the oracle's CAST(...) AS DOUBLE exactly
        v = float(36 * (n * sxy - sx * sy)) / float(den)
        slope = math.floor(v * 1e6 + 0.5) / 1e6
    return pd.DataFrame(
        {"user_id": [int(pdf["user_id"].iloc[0])], "n_points": [n],
         "slope_per_hour": [slope]}
    )


@query(
    "applyinpandas_user_trend",
    oracle=f"""
WITH t AS (
  SELECT user_id,
         epoch_us(ts) // 1000000
           - MIN(epoch_us(ts) // 1000000) OVER (PARTITION BY user_id) AS x,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS y
  FROM events
),
s AS (
  SELECT user_id, COUNT(*) AS n,
         SUM(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy,
         SUM(CAST(x AS HUGEINT)) AS sx,
         SUM(CAST(y AS HUGEINT)) AS sy,
         SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx
  FROM t GROUP BY user_id
)
SELECT user_id, CAST(n AS BIGINT) AS n_points,
       CASE WHEN n * sxx - sx * sx = 0 THEN NULL
            ELSE {sql_round(
                "CAST(36 * (n * sxy - sx * sy) AS DOUBLE)"
                " / CAST(n * sxx - sx * sx AS DOUBLE)", 6)}
       END AS slope_per_hour
FROM s
""",
    tags=("pandas-udf", "A9", "W1"),
)
def applyinpandas_user_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user OLS slope of event value over time (currency units per
    hour) via batch applyInPandas — must hash-match the pure-SQL
    covariance form the oracle runs."""
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        F.expr("unix_micros(ts) div 1000000").alias("x"),
        F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5)).cast("bigint").alias("y"),
    )
    return ev.groupBy("user_id").applyInPandas(_ols_slope, schema=OUT_SCHEMA)
