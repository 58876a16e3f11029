"""Smoke test of the driver contract in __spark_entry__.py."""

from __future__ import annotations

import importlib
import json


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


def test_rotation_order_live_is_permutation():
    """Whatever the live CORRECTNESS history says (it is driver-owned and
    mutates between rounds — the r6 lesson: asserting specific head
    positions against it flips as soon as the driver re-greens a bumped
    query), the rotation must always be a permutation of the registry."""
    mod = importlib.import_module("__spark_entry__")
    order = mod._rotation_order()
    from big_data_competition_dxc_spark import plans

    assert sorted(order) == sorted(plans.QUERIES)


def test_rotation_order_priorities(tmp_path):
    """Each rotation priority class, pinned against a SYNTHETIC
    CORRECTNESS history (tmp_path) so the test is independent of the
    driver-owned files at the repo root:

    1. a recorded-False verdict leads;
    2. an unexpired contract bump leads (approx_distinct_check is bumped
       to r7 and the synthetic history only records it at r2);
    3. an expired bump rotates back to normal green order (q12 is bumped
       to r6 and the synthetic history records it green AT r6);
    4. never-driver-checked queries rank before any green;
    5. greens order least-recently-checked first.
    """
    mod = importlib.import_module("__spark_entry__")
    from big_data_competition_dxc_spark import plans

    green = {
        "rows_match": True,
        "schema_match": True,
        "hash_match": True,
        "spark_rows": 1,
        "oracle_rows": 1,
        "err": None,
    }
    red = dict(green, hash_match=False)
    rows_only = {
        "rows_match": None,
        "schema_match": None,
        "hash_match": None,
        "spark_rows": 1,
        "oracle_rows": None,
        "err": "no_oracle",
    }
    (tmp_path / "CORRECTNESS_r02.json").write_text(
        json.dumps({"approx_distinct_check": rows_only})
    )
    (tmp_path / "CORRECTNESS_r05.json").write_text(
        json.dumps({"pricing_summary": green})
    )
    (tmp_path / "CORRECTNESS_r06.json").write_text(
        json.dumps(
            {
                "daily_rollup": green,
                "join_theta_sql": red,
                "q12_priority_by_linestatus": green,
                "stratified_sample": green,
            }
        )
    )

    order = mod._rotation_order(history_dir=str(tmp_path))
    assert sorted(order) == sorted(plans.QUERIES)
    pos = {n: i for i, n in enumerate(order)}

    # class 1+2: the red verdict and the unexpired bump lead
    assert pos["join_theta_sql"] < 2
    assert pos["approx_distinct_check"] < 2
    # class 3: bumps recorded green at/after their bump round expired
    checked = {
        "approx_distinct_check",
        "pricing_summary",
        "daily_rollup",
        "join_theta_sql",
        "q12_priority_by_linestatus",
        "stratified_sample",
    }
    never = [n for n in plans.QUERIES if n not in checked]
    worst_never = max(pos[n] for n in never)
    assert pos["q12_priority_by_linestatus"] > worst_never
    assert pos["stratified_sample"] > worst_never
    # class 4: every never-checked query beats every green
    greens = [
        "pricing_summary",
        "daily_rollup",
        "q12_priority_by_linestatus",
        "stratified_sample",
    ]
    assert worst_never < min(pos[n] for n in greens)
    # class 5: greens are LRU — the r5-checked green precedes r6 greens
    assert pos["pricing_summary"] < pos["daily_rollup"]
    assert pos["pricing_summary"] < pos["q12_priority_by_linestatus"]


def test_rotation_order_empty_history(tmp_path):
    """No CORRECTNESS files at all: bumped queries lead (never sampled at
    or after their bump round), everything else keeps registry order."""
    mod = importlib.import_module("__spark_entry__")
    from big_data_competition_dxc_spark import plans

    order = mod._rotation_order(history_dir=str(tmp_path))
    assert sorted(order) == sorted(plans.QUERIES)
    pos = {n: i for i, n in enumerate(order)}
    assert pos["q12_priority_by_linestatus"] < 3
    assert pos["stratified_sample"] < 3
    assert pos["approx_distinct_check"] < 3
