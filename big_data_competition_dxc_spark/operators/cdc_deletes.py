"""CDC apply with delete tombstones (the missing half of merge_upsert).

merge_upsert_latest (operators/history.py) converges a change stream
of pure upserts; real CDC feeds (Debezium-style) also carry DELETE
tombstones, and the compacted snapshot must DROP a key whose latest
change is a delete — not just keep its newest row. The change stream
is derived deterministically from the events fixture: every event is
an upsert except 'error' events, which act as tombstones for that
user (a synthetic but fixed op-mapping both engines share).

Semantics, identical to MERGE INTO ... WHEN MATCHED AND op='D' THEN
DELETE applied in ts order then compacted: per user, take the latest
change (ts DESC, event_id DESC tiebreak); emit it only if that latest
change is NOT a tombstone. One shuffle on user_id; the per-key top-1
is a WindowGroupLimit (heap per partition, no global sort), and the
tombstone filter is applied AFTER the argmax — filtering tombstones
first would wrongly resurrect the previous upsert.

Scale notes (100 TB): identical cost shape to merge_upsert_latest —
this is the compaction every CDC sink runs; the tombstone rule adds a
single predicate, no extra exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources import load

TOMBSTONE_TYPE = "error"


@query(
    "cdc_apply_with_deletes",
    oracle=f"""
WITH latest AS (
  SELECT user_id, event_type, value, ts,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT user_id,
       event_type AS last_type,
       value AS last_value,
       ts AS last_ts
FROM latest
WHERE rn = 1 AND event_type <> '{TOMBSTONE_TYPE}'
""",
    tags=("cdc", "history", "W4", "P10"),
)
def cdc_apply_with_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compacted CDC snapshot where '{TOMBSTONE_TYPE}' events are
    delete tombstones: users whose LATEST change is a tombstone vanish
    from the snapshot; everyone else keeps their newest row. Must
    equal the ordered row-by-row merge's converged state (oracle)."""
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        load(spark, sf_dir, "events")
        .select("user_id", "event_type", "value", "ts", "event_id")
        .withColumn("rn", F.row_number().over(w))
        # tombstone test AFTER the argmax: filtering first would
        # resurrect the prior upsert for deleted keys
        .filter((F.col("rn") == 1) & (F.col("event_type") != TOMBSTONE_TYPE))
        .select(
            "user_id",
            F.col("event_type").alias("last_type"),
            F.col("value").alias("last_value"),
            F.col("ts").alias("last_ts"),
        )
    )
