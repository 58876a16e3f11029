"""Smoke test of the driver contract in __spark_entry__.py."""

from __future__ import annotations

import importlib


def test_entry_contract(spark):
    mod = importlib.import_module("__spark_entry__")
    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "user_id" in df.columns and "n_click" in df.columns

    qs = mod.queries()
    oracles = mod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert "daily_rollup" in qs and "daily_rollup" in oracles
