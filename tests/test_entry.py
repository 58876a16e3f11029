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


def test_rotation_order_priorities():
    """stale-FAIL (error OR any recorded False verdict OR contract bump)
    must outrank never-checked, which outranks greens; greens order
    least-recently-checked first. Pinned against the real committed
    CORRECTNESS history: r5 recorded q12_priority_by_linestatus with
    hash_match=false/err=null — the shape the r5 rotation ordering
    missed — so it must now lead the rotation."""
    mod = importlib.import_module("__spark_entry__")
    order = mod._rotation_order()
    from big_data_competition_dxc_spark import plans

    assert sorted(order) == sorted(plans.QUERIES)  # a permutation, always
    # the r5 hash mismatch + the r6 contract bumps lead
    assert order.index("q12_priority_by_linestatus") < 2
    assert order.index("stratified_sample") < 2
    # never-driver-checked queries rank before long-green ones
    import glob as _glob
    import json as _json
    import os as _os

    here = _os.path.dirname(_os.path.abspath(mod.__file__))
    seen: set[str] = set()
    for path in _glob.glob(_os.path.join(here, "CORRECTNESS_r*.json")):
        with open(path) as f:
            rec = _json.load(f)
        if isinstance(rec, dict):
            seen.update(rec)
    never = [n for n in plans.QUERIES if n not in seen]
    if never:  # at r6 ~30 such queries exist; guard for later rounds
        green_sampled = [
            n
            for n in plans.QUERIES
            if n in seen
            and n not in ("q12_priority_by_linestatus", "stratified_sample")
        ]
        worst_never = max(order.index(n) for n in never)
        best_green = min(order.index(n) for n in green_sampled)
        assert worst_never < best_green
