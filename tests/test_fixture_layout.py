"""Pins for the r10 scan-parallelism fix (SCALING.md, r10 entry).

A parquet ROW GROUP is Spark's unit of scan parallelism; the pre-r10
scale fixture shipped `documents` as one row group and the session left
`maxPartitionBytes` at 128MB, so every CPU-heavy corpus projection ran
as ONE task on 32 cores. These pins keep both halves of the fix from
silently regressing.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

SF1_DIR = os.path.join(os.path.dirname(__file__), "..", "benchdata", "sf1")

#: Minimum row groups per sf1 fact table (gen_scale_data.py ROW_GROUPS
#: targets >= 32; the floor here leaves slack for DuckDB vector-size
#: rounding).
MIN_GROUPS = {
    "documents": 20,
    "embeddings": 8,
    "events": 25,
    "orders": 25,
    "lineitem": 100,
}


@pytest.mark.parametrize("table", sorted(MIN_GROUPS))
def test_sf1_fixture_is_row_group_splittable(table):
    path = os.path.join(SF1_DIR, f"{table}.parquet")
    if not os.path.exists(path):
        pytest.skip("benchdata/sf1 not generated on this tree")
    groups = pq.ParquetFile(path).num_row_groups
    assert groups >= MIN_GROUPS[table], (
        f"{table}: {groups} row groups — a near-single-group scale "
        "fixture serializes every corpus scan (regenerate with "
        "scripts/gen_scale_data.py, which sets ROW_GROUP_SIZE per table)"
    )


def test_sf1_scan_task_counts_near_core_count(spark):
    """End-to-end pin of the split formula against the scale fixture:
    with the 256k openCostInBytes floor under the default 128MB
    ceiling, both the big table (lineitem, bytes/parallelism-sized
    splits) and the small CPU-heavy table (documents, floor-sized
    splits) must land NEAR the session's core count — neither the r10
    1-task serialization nor the 135-task flat-1MB tax. Bounds are
    loose on purpose: they catch order-of-magnitude regressions, not
    byte-level drift."""
    import os as _os

    if not _os.path.exists(_os.path.join(SF1_DIR, "lineitem.parquet")):
        pytest.skip("benchdata/sf1 not generated on this tree")
    from big_data_competition_dxc_spark.sources import load

    cores = int(spark.sparkContext.defaultParallelism)
    li = load(spark, SF1_DIR, "lineitem").rdd.getNumPartitions()
    doc = load(spark, SF1_DIR, "documents").rdd.getNumPartitions()
    assert cores <= li <= 5 * cores, f"lineitem scan tasks {li} vs {cores} cores"
    assert 4 <= doc <= 5 * cores, f"documents scan tasks {doc} vs {cores} cores"


def test_session_uses_fixture_scale_scan_splits(spark):
    """The local session must lower the split-size FLOOR so MB-scale
    fixture tables get multi-task scans, while keeping the 128MB ceiling
    so large tables split by bytes/defaultParallelism instead of a flat
    1MB tax (the r10 trailing-flag fix — session.py documents the
    formula). Cluster deploys get stock defaults via build_plan."""
    assert spark.conf.get("spark.sql.files.openCostInBytes") == "256k"
    # ceiling stays at the Spark default (134217728 = 128MB)
    assert spark.conf.get("spark.sql.files.maxPartitionBytes") == "134217728b"
