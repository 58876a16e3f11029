"""Point-in-time (PIT) multi-feature join — the feature-store
enrichment pattern for leakage-safe training data.

Extends the single-source as-of join (operators/asof.py, the union +
carry-forward composition) to the shape a real feature store serves:
one LABEL stream joined against SEVERAL feature sources, each as of a
time STRICTLY BEFORE the label timestamp (same-instant features are
training-serving leakage and must not be visible). The reference has
the single-table lag/as-of enrichments (M:406-434's shifted-date join
family); PIT-correct multi-source assembly is the training-pipeline
generalization the brief calls for.

Spark-first design — ONE window pass for ALL feature sources:

  tag label rows 0 and every feature source's rows 1, union them all,
  and scan per user ordered by (t, tag). A label row at date t sorts
  BEFORE same-date feature rows, so an unbounded-preceding frame at the
  label row sees exactly the strictly-earlier features. Within that
  single frame we read BOTH feature kinds at once:
    - a running aggregate (cumulative click count: SUM over the click
      source's rows in-frame), and
    - a latest-value feature (most recent daily order spend:
      last(ignorenulls) over the order source's rows in-frame).

  Cost: one shuffle on user_id for the whole assembly, O(1) carried
  state per user — vs one shuffle PER feature table for chained as-of
  joins, or the naive range join that materializes every
  (label, earlier-feature) pair. At 100 TB the union'd scan is
  input-proportional and the window never re-sorts per source.

Determinism: feature sources are pre-aggregated to one row per
(user, day), so last(ignorenulls) never ties between two rows of the
same source; rows of DIFFERENT sources carry nulls in each other's
columns and cannot be selected. Day spend accumulates in exact integer
cents (fixed_sum) so the double is identical on every engine and
partitioning.

Oracle: DuckDB's native chained ``ASOF LEFT JOIN`` with a strict ``>``
condition — one ASOF per feature table over the same pre-aggregated
snapshots.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.rounding import fixed_sum, sql_fixed_sum
from ..plans.registry import query
from ..sources import load


def pit_enrich_frames(
    labels: DataFrame, clicks: DataFrame, spend: DataFrame
) -> DataFrame:
    """The PIT assembly itself, over arbitrary frames — exposed so the
    operator is reusable beyond the fixture query and so the
    random-timeline property test (tests/test_properties.py) can pin
    its semantics against a brute-force spec.

    Inputs (one row per (user_id, t) in each feature frame — the
    determinism contract from the module docstring):
      labels  (user_id, t, event_id)
      clicks  (user_id, t, click_n)
      spend   (user_id, t, day_spend)
    Output: one row per label with clicks_before (running SUM of
    strictly-earlier click_n, 0 if none) and spend_before (latest
    strictly-earlier day_spend, NULL if none)."""
    lbl = labels.select(
        "user_id",
        "t",
        F.lit(0).alias("tag"),  # labels sort BEFORE same-day features: strict <
        "event_id",
        F.lit(None).cast("bigint").alias("click_n"),
        F.lit(None).cast("double").alias("day_spend"),
    )
    ca = clicks.select(
        "user_id", "t", F.lit(1).alias("tag"),
        F.lit(None).cast("bigint").alias("event_id"),
        F.col("click_n").cast("bigint").alias("click_n"),
        F.lit(None).cast("double").alias("day_spend"),
    )
    sa = spend.select(
        "user_id", "t", F.lit(1).alias("tag"),
        F.lit(None).cast("bigint").alias("event_id"),
        F.lit(None).cast("bigint").alias("click_n"),
        F.col("day_spend").cast("double").alias("day_spend"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        lbl.unionByName(ca)
        .unionByName(sa)
        .withColumn("clicks_before", F.sum("click_n").over(w))
        .withColumn("spend_before", F.last("day_spend", ignorenulls=True).over(w))
    )
    return carried.filter(F.col("tag") == 0).select(
        "event_id",
        "user_id",
        F.col("t").alias("label_ds"),
        F.coalesce(F.col("clicks_before"), F.lit(0)).cast("bigint").alias("clicks_before"),
        "spend_before",
    )


@query(
    "pit_feature_join",
    oracle=f"""
WITH lbl AS (
  SELECT event_id, user_id, CAST(ts AS DATE) AS label_ds
  FROM events WHERE event_type = 'purchase'
),
fa AS (
  SELECT user_id, ds,
         CAST(SUM(n) OVER (PARTITION BY user_id ORDER BY ds) AS BIGINT)
           AS cum_clicks
  FROM (SELECT user_id, CAST(ts AS DATE) AS ds, COUNT(*) AS n
        FROM events WHERE event_type = 'click' GROUP BY 1, 2)
),
fb AS (
  SELECT o_custkey AS user_id, CAST(o_orderdate AS DATE) AS ds,
         {sql_fixed_sum('o_totalprice', 2, 2)} AS day_spend
  FROM orders GROUP BY 1, 2
)
SELECT l.event_id, l.user_id, l.label_ds,
       COALESCE(a.cum_clicks, 0) AS clicks_before,
       b.day_spend AS spend_before
FROM lbl l
ASOF LEFT JOIN fa a ON l.user_id = a.user_id AND l.label_ds > a.ds
ASOF LEFT JOIN fb b ON l.user_id = b.user_id AND l.label_ds > b.ds
""",
    tags=("J7", "W1", "asof", "pipeline"),
)
def pit_feature_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each purchase (the label) enriched with two leakage-safe
    features as of strictly before the purchase date: the user's
    cumulative click count and the user's most recent daily order
    spend. Single union + one per-user window pass for both sources;
    NULL spend / zero clicks when no feature row precedes the label."""
    ev = load(spark, sf_dir, "events")

    labels = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.to_date("ts").alias("t"), "event_id"
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", F.to_date("ts").alias("t"))
        .agg(F.count("*").alias("click_n"))
    )
    spend = (
        load(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_custkey").alias("user_id"),
            F.to_date("o_orderdate").alias("t"),
        )
        .agg(fixed_sum(F.col("o_totalprice"), 2, 2).alias("day_spend"))
    )
    return pit_enrich_frames(labels, clicks, spend)
