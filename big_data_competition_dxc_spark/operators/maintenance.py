"""Materialized-aggregate maintenance and snapshot drift monitoring.

``incremental_rollup_maintenance`` is the correctness core of every
incremental pipeline: a materialized per-(day, type) aggregate is
maintained by MERGING a late-arriving delta into the existing
snapshot — two partial aggregates full-outer-joined on the group key,
counts and exact integer value-units added with coalesce — and the
merged state must equal a full recompute over all data (the oracle).
The late delta is a deterministic 10% slice (event_id % 10 = 0)
spread across ALL days, so the merge genuinely overlaps existing
groups instead of appending disjoint ones; the additivity being
verified (SUM/COUNT are commutative monoids over exact integers) is
the same algebra map-side combine relies on.

``snapshot_drift_report`` is the monitoring twin: event-type mix of
the first 15 days vs the rest, shares in exact integer permille
(floor-div — no float shares, no libm KL/PSI logs), with the
per-type permille delta a drift alert would threshold on.

Scale notes (100 TB): the snapshot never recomputes history — cost is
O(delta) + a join keyed on the group key against state that lives
columnar; at warehouse scale the same merge is MERGE INTO on a keyed
table. The drift report is two single-pass aggregates over a
partition-pruned scan each.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import round_to, sql_fixed_sum, to_units
from ..plans.registry import query
from ..sources import load

LATE_MOD = 10  # event_id % LATE_MOD == 0 -> the late-arriving delta
DRIFT_SPLIT_DAYS = 15


def _partial(df) -> DataFrame:
    return df.groupBy(F.to_date("ts").alias("ds"), "event_type").agg(
        F.count("*").alias("n"),
        F.sum(to_units(F.col("value"), 2)).alias("units"),
    )


@query(
    "incremental_rollup_maintenance",
    oracle=f"""
SELECT CAST(ts AS DATE) AS ds, event_type,
       COUNT(*) AS n_events,
       {sql_fixed_sum("value", 2, 2)} AS total_value
FROM events
GROUP BY 1, 2
""",
    tags=("A1", "J2", "U1", "cdc"),
)
def incremental_rollup_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot (90% initial load) merged with a late-arriving delta
    (10%, all days) via full-outer coalesce-add on the group key —
    must hash-match the full recompute the oracle runs."""
    ev = load(spark, sf_dir, "events")
    snapshot = _partial(ev.filter(F.col("event_id") % LATE_MOD != 0)).select(
        "ds", "event_type", F.col("n").alias("n0"), F.col("units").alias("u0")
    )
    delta = _partial(ev.filter(F.col("event_id") % LATE_MOD == 0)).select(
        "ds", "event_type", F.col("n").alias("n1"), F.col("units").alias("u1")
    )
    zero = F.lit(0).cast("decimal(38,0)")
    merged = snapshot.join(delta, ["ds", "event_type"], "full_outer").select(
        "ds",
        "event_type",
        (F.coalesce("n0", F.lit(0)) + F.coalesce("n1", F.lit(0))).alias("n_events"),
        (F.coalesce("u0", zero) + F.coalesce("u1", zero)).alias("units"),
    )
    return merged.select(
        "ds",
        "event_type",
        "n_events",
        round_to(F.col("units") / F.lit(100.0), 2).alias("total_value"),
    )


@query(
    "snapshot_drift_report",
    oracle=f"""
WITH cutoff AS (
  SELECT CAST(min(ts) AS DATE) + INTERVAL {DRIFT_SPLIT_DAYS} DAY AS c FROM events
),
a AS (
  SELECT event_type, COUNT(*) AS n_a FROM events
  WHERE CAST(ts AS DATE) < (SELECT c FROM cutoff) GROUP BY event_type
),
b AS (
  SELECT event_type, COUNT(*) AS n_b FROM events
  WHERE CAST(ts AS DATE) >= (SELECT c FROM cutoff) GROUP BY event_type
),
t AS (SELECT (SELECT SUM(n_a) FROM a) AS ta, (SELECT SUM(n_b) FROM b) AS tb)
SELECT COALESCE(a.event_type, b.event_type) AS event_type,
       CAST(COALESCE(a.n_a, 0) AS BIGINT) AS n_a,
       CAST(COALESCE(b.n_b, 0) AS BIGINT) AS n_b,
       CAST((COALESCE(a.n_a, 0) * 1000) // (SELECT ta FROM t) AS BIGINT)
         AS share_a_pm,
       CAST((COALESCE(b.n_b, 0) * 1000) // (SELECT tb FROM t) AS BIGINT)
         AS share_b_pm,
       CAST((COALESCE(b.n_b, 0) * 1000) // (SELECT tb FROM t)
            - (COALESCE(a.n_a, 0) * 1000) // (SELECT ta FROM t) AS BIGINT)
         AS delta_pm
FROM a FULL OUTER JOIN b ON a.event_type = b.event_type
""",
    tags=("A1", "governance", "P3"),
)
def snapshot_drift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type mix drift between the first {DRIFT_SPLIT_DAYS} days
    and the rest: exact integer permille shares per window and their
    delta — the quantity a data-drift alert thresholds on."""
    ev = load(spark, sf_dir, "events").select(
        F.to_date("ts").alias("ds"), "event_type"
    )
    cutoff = ev.agg(F.date_add(F.min("ds"), DRIFT_SPLIT_DAYS).alias("c")).collect()[
        0
    ]["c"]
    a = (
        ev.filter(F.col("ds") < F.lit(cutoff))
        .groupBy("event_type")
        .agg(F.count("*").alias("n_a"))
    )
    b = (
        ev.filter(F.col("ds") >= F.lit(cutoff))
        .groupBy("event_type")
        .agg(F.count("*").alias("n_b"))
    )
    ta = a.agg(F.sum("n_a")).collect()[0][0]
    tb = b.agg(F.sum("n_b")).collect()[0][0]
    if not ta or not tb:
        # an empty snapshot window (SUM over no rows collects None)
        # would otherwise interpolate 'div None' into the expressions
        # below — fail loudly instead of emitting an unparseable plan
        raise ValueError(
            f"snapshot_drift_report: empty window (ta={ta}, tb={tb}); "
            f"need events on both sides of the {DRIFT_SPLIT_DAYS}-day cutoff"
        )
    # FULL OUTER, not inner: an event type present in only one window
    # (newly appearing or vanished — the strongest drift signal) must
    # surface with a ±share permille delta, not silently drop out.
    return (
        a.join(b, "event_type", "full_outer")
        .withColumn("n_a", F.coalesce("n_a", F.lit(0)))
        .withColumn("n_b", F.coalesce("n_b", F.lit(0)))
        .select(
            "event_type",
            "n_a",
            "n_b",
            F.expr(f"(n_a * 1000) div {ta}").alias("share_a_pm"),
            F.expr(f"(n_b * 1000) div {tb}").alias("share_b_pm"),
            F.expr(f"(n_b * 1000) div {tb} - (n_a * 1000) div {ta}").alias(
                "delta_pm"
            ),
        )
    )
