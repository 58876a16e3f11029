"""Scoped session-conf overrides for streaming runs.

The tree's conf-scope discipline (see rollup_stream.nanos_conf_scope,
operators/scripting.scripting_conf_scope): a registered query may
adjust session conf only for the duration of its own execution and
must restore the previous value — nothing leaks into later queries.

``state_partitions_scope`` pins ``spark.sql.shuffle.partitions`` to a
stateful streaming query's KEY DOMAIN for one stream run. A streaming
aggregation creates one state store per shuffle partition, fixed at
the checkpoint's first micro-batch; with the session default (32) a
query whose key domain is a small CONSTANT set (tick-feed buckets,
event types) commits 32 snapshot+delta stores per micro-batch to hold
a handful of rows — most of them empty. Pinning to the domain size
removes that per-batch commit fan-out. This is NOT a core-count tune:
it only applies where the key domain is a schema constant independent
of data scale, the reduce side of the aggregation only ever merges
map-side partials (≤ domain-size rows per map task at any scale), and
batch queries' partitioning is untouched. State keyed by a SCALING
domain (users, sessions) must keep the session default — documented
per call site.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import SparkSession


@contextmanager
def state_partitions_scope(spark: SparkSession, n: int):
    key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, str(n))
    try:
        yield
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
