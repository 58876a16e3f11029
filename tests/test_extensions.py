"""Invariants of the extension-surface operators (PrefixSpan, Python
DataSource, recursive CTE, UDTF) beyond the DuckDB hash gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_competition_dxc_spark import plans
from big_data_competition_dxc_spark.ml.seqmining import MIN_SUPPORT
from big_data_competition_dxc_spark.operators.recursive_cte import MAX_HOPS
from big_data_competition_dxc_spark.sources import load

from conftest import SF_TEST_DIR

plans.load_all()


def _df(name, spark):
    return plans.QUERIES[name].fn(spark, SF_TEST_DIR)


def test_prefixspan_threshold_binds(spark):
    """Every mined pattern meets the minCount implied by MIN_SUPPORT,
    and patterns are drawn from the event-type alphabet."""
    import math

    ev = load(spark, SF_TEST_DIR, "events")
    n_seq = ev.select("user_id", F.to_date("ts").alias("ds")).distinct().count()
    min_count = math.ceil(MIN_SUPPORT * n_seq)
    types = {r[0] for r in ev.select("event_type").distinct().collect()}
    rows = _df("prefixspan_day_journeys", spark).collect()
    assert rows
    for r in rows:
        assert r.n_days >= min_count
        assert r.first_type in types and r.then_type in types


def test_python_datasource_plans_parallel_partitions(spark):
    """The custom source must expose its shards as separate input
    partitions (the whole point of partitions())."""
    from big_data_competition_dxc_spark.sources.pysource import (
        N_PARTS,
        N_ROWS,
        DeterministicFeedSource,
    )

    spark.dataSource.register(DeterministicFeedSource)
    feed = spark.read.format("deterministic_feed").load()
    assert feed.rdd.getNumPartitions() == N_PARTS
    assert feed.count() == N_ROWS


def test_recursive_reach_anchored_and_bounded(spark):
    """The source supplier sits at hops 0; no node exceeds MAX_HOPS;
    per-level dedup bounds each node's row count by the level count."""
    rows = _df("recursive_cte_reach", spark).collect()
    assert rows
    src = min(r.s_suppkey for r in rows if r.min_hops == 0)
    assert any(r.s_suppkey == src and r.min_hops == 0 for r in rows)
    assert all(0 <= r.min_hops <= MAX_HOPS for r in rows)
    assert all(1 <= r.n_levels <= MAX_HOPS + 1 for r in rows)


def test_udtf_chunks_reassemble(spark):
    """Joining each document's chunks back in order must reproduce the
    original text exactly — the UDTF is a lossless partition."""
    chunks = _df("udtf_word_chunks", spark)
    rebuilt = (
        chunks.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("chunk_idx", "chunk"))),
                    lambda s: s["chunk"],
                ),
                " ",
            ).alias("rebuilt")
        )
    )
    docs = load(spark, SF_TEST_DIR, "documents").select("doc_id", "text")
    bad = (
        docs.join(rebuilt, "doc_id", "left")
        .filter(
            F.col("rebuilt").isNull() | (F.col("rebuilt") != F.col("text"))
        )
        .count()
    )
    assert bad == 0
