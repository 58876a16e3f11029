"""Rows-only checks for the multimodal Pandas-UDF plumbing's internal
array-valued stages (the registered queries — now posexploded to scalar
rows and oracle-paired — are covered by test_oracle_parity)."""

from __future__ import annotations

from big_data_competition_dxc_spark import plans
from big_data_competition_dxc_spark.multimodal.binary_ops import (
    decode_features,
    resize_features,
)

from conftest import SF_TEST_DIR

plans.load_all()


def test_decode_stub_shapes(spark):
    rows = decode_features(spark, SF_TEST_DIR).collect()
    assert len(rows) > 0
    assert all(len(r["feature"]) == 8 for r in rows[:20])
    assert all(r["n_channels"] == 3 for r in rows[:20])


def test_resize_stub_chained_stages(spark):
    df = resize_features(spark, SF_TEST_DIR)
    rows = df.collect()
    assert len(rows) > 0
    assert all(r["width"] == 224 and r["height"] == 224 for r in rows[:20])
    assert all(len(r["feature"]) == 4 for r in rows[:20])
    # deterministic across runs (fixed pooling, no randomness)
    again = resize_features(spark, SF_TEST_DIR).collect()
    assert sorted(map(str, rows)) == sorted(map(str, again))


def test_registered_stub_queries_are_scalar(spark):
    """The driver canonicalizes results with a pandas sort — list-typed
    columns break it. The registered stub queries must be scalar-only."""
    for name in ("multimodal_decode_stub", "multimodal_resize_stub"):
        df = plans.QUERIES[name].fn(spark, SF_TEST_DIR)
        for field in df.schema.fields:
            assert field.dataType.typeName() not in ("array", "map"), (
                name,
                field.name,
            )
