"""Ordered-funnel (sequence) analysis over the event stream.

The product-analytics staple the reference's relational surface can't
express (SURVEY §2 — it has no ordered-sequence operator): for each
user, did view → click → purchase happen IN ORDER, and when? Each
stage anchors on the previous one (the first click AFTER the first
view, not any click), so this is not three independent filters.

Spark shape: three chained window minima over the SAME partition key —
stage k+1's conditional min references stage k's column, which is
partition-constant, so all three windows (plus the final dedup) run on
one user_id shuffle; Catalyst plans consecutive same-key window ops
over a single Exchange. At 100 TB: one shuffle of (user_id, type, ts)
triples — no text, no joins, no driver state; funnels over billions of
users are exactly this plan with more stages chained.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources import load

_FUNNEL_ORACLE = """
WITH s1 AS (
  SELECT user_id, event_type, ts,
         MIN(CASE WHEN event_type = 'view' THEN ts END)
           OVER (PARTITION BY user_id) AS t_view
  FROM events
),
s2 AS (
  SELECT *, MIN(CASE WHEN event_type = 'click' AND ts > t_view THEN ts END)
              OVER (PARTITION BY user_id) AS t_click
  FROM s1
),
s3 AS (
  SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts > t_click THEN ts END)
              OVER (PARTITION BY user_id) AS t_purchase
  FROM s2
)
SELECT DISTINCT user_id, t_view, t_click, t_purchase,
       CAST(CASE WHEN t_purchase IS NOT NULL THEN 3
                 WHEN t_click IS NOT NULL THEN 2
                 WHEN t_view IS NOT NULL THEN 1
                 ELSE 0 END AS BIGINT) AS stage
FROM s3
"""


@query("funnel_view_click_purchase", oracle=_FUNNEL_ORACLE, tags=("W1", "funnel", "sequence"))
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user ordered funnel: first view, first click after that
    view, first purchase after that click, and the furthest stage
    reached (0-3). A user who purchases before ever viewing does NOT
    count as converted — order is the whole point."""
    w = Window.partitionBy("user_id")
    e = load(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    staged = (
        e.withColumn(
            "t_view",
            F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w),
        )
        .withColumn(
            "t_click",
            F.min(
                F.when(
                    (F.col("event_type") == "click") & (F.col("ts") > F.col("t_view")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "t_purchase",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") > F.col("t_click")),
                    F.col("ts"),
                )
            ).over(w),
        )
    )
    stage = (
        F.when(F.col("t_purchase").isNotNull(), 3)
        .when(F.col("t_click").isNotNull(), 2)
        .when(F.col("t_view").isNotNull(), 1)
        .otherwise(0)
        .cast("bigint")
    )
    return staged.select(
        "user_id", "t_view", "t_click", "t_purchase", stage.alias("stage")
    ).distinct()
