"""Streaming deduplication with bounded state
(``dropDuplicatesWithinWatermark``).

The streaming member of the dedup family (dedup/exact.py is the batch
form): an ingest stream carries replayed rows — at-least-once sources
re-deliver — and the pipeline must emit each event once WITHOUT keeping
every seen key forever. The watermark is what makes that possible at
100 TB: state for an event_id is dropped once the watermark passes it,
so state size tracks the out-of-orderness horizon (here 1 hour), not
the stream's lifetime. A plain ``dropDuplicates`` on a stream never
evicts — the classic unbounded-state bug this operator exists to fix.

The fixture has no duplicate event_ids, so staging injects them: every
event of a slice of users is written twice. The oracle is then simply
the original events table — bounded replay in, exactly-once out.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources import load
from .rollup_stream import drain_to_memory

DUP_USERS_BELOW = 30


@query(
    "stream_dedup_watermark",
    oracle="SELECT event_id, ts, user_id, event_type, value FROM events",
    tags=("streaming", "dedup", "A7"),
)
def stream_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once over an at-least-once stream: events of users below
    {DUP_USERS_BELOW} are replayed (written twice into the staged ingest
    dir), and dropDuplicatesWithinWatermark('event_id') under a 1-hour
    watermark removes the replays with per-key state that the watermark
    retires. availableNow over the bounded input must reproduce the
    pristine events table."""
    stage = tempfile.mkdtemp(prefix="stream_dedup_")
    in_dir = os.path.join(stage, "in")
    ev = load(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    # at-least-once ingest: one clean copy + a replayed slice
    ev.unionAll(ev.filter(F.col("user_id") < DUP_USERS_BELOW)).write.parquet(in_dir)
    schema = "event_id bigint, ts timestamp, user_id bigint, event_type string, value double"
    deduped = (
        spark.readStream.schema(schema)
        .parquet(in_dir)
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    rows = drain_to_memory(spark, deduped, stage, "append")
    return spark.createDataFrame(rows, schema)
