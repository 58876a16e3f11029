"""Rows-only checks for the multimodal Pandas-UDF plumbing (the
oracle-paired byte/frame queries are covered by test_oracle_parity)."""

from __future__ import annotations

from big_data_competition_dxc_spark import plans

from conftest import SF_TEST_DIR

plans.load_all()


def test_decode_stub_shapes(spark):
    rows = plans.QUERIES["multimodal_decode_stub"].fn(spark, SF_TEST_DIR).collect()
    assert len(rows) > 0
    assert all(len(r["feature"]) == 8 for r in rows[:20])
    assert all(r["n_channels"] == 3 for r in rows[:20])


def test_resize_stub_chained_stages(spark):
    df = plans.QUERIES["multimodal_resize_stub"].fn(spark, SF_TEST_DIR)
    rows = df.collect()
    assert len(rows) > 0
    assert all(r["width"] == 224 and r["height"] == 224 for r in rows[:20])
    assert all(len(r["feature"]) == 4 for r in rows[:20])
    # deterministic across runs (fixed pooling, no randomness)
    again = plans.QUERIES["multimodal_resize_stub"].fn(spark, SF_TEST_DIR).collect()
    assert sorted(map(str, rows)) == sorted(map(str, again))
