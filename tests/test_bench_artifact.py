"""Unit pins for the compact bench line's drop policy (bench.py).

The driver records only the last ~2000 chars of bench output; the
compact summary line must always fit and must shed the LEAST valuable
fields first. This has regressed twice (BENCH_r05–r07 parsed:null when
the single full line outgrew the window; BENCH_r09 dropped the accepted
scale block's per-query mins while keeping spotlight attempt history —
the r9 verdict's item 3), so the policy is pinned here, Spark-free.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

from bench import TAIL_BUDGET, build_drop_order, shrink_to_budget


def _fat_compact(n_main=18, n_scale=18, n_spot=8, n_att=5):
    """A worst-case realistic compact dict: escalated 5-attempt blocks,
    full q_min maps with long query names, spotlight at both scales."""
    q = lambda n, i: f"a_very_long_headline_query_name_number_{i:02d}"
    att = [[41.234, 1597, 1.15] for _ in range(n_att)]
    return {
        "metric": "headline_summary",
        "value": 41.234,
        "unit": "sec",
        "sf": 0.1,
        "probe": 1.15,
        "steal": 1597,
        "accepted": False,
        "att": att,
        "normalized": 32.64,
        "n_queries": n_main,
        "trailing_flags": [q(0, i) for i in range(4)],
        "memo": [q(0, i) for i in range(7)],
        "q_min": {q(0, i): 1.234 for i in range(n_main)},
        "scale": {
            "value": 83.95,
            "probe": 1.12,
            "steal": 1597,
            "accepted": False,
            "att": att,
            "trailing_flags": [],
            "memo": [q(0, i) for i in range(7)],
            "q_min": {q(0, i): 4.567 for i in range(n_scale)},
        },
        "spot": {
            "round": 10,
            "names": [f"spotlight_query_with_a_long_name_{i}" for i in range(n_spot)],
            "ratio": {f"spotlight_query_with_a_long_name_{i}": 1.5 for i in range(n_spot)},
            "q_min": {f"spotlight_query_with_a_long_name_{i}": 0.9 for i in range(n_spot)},
            "q_min_scale": {f"spotlight_query_with_a_long_name_{i}": 1.4 for i in range(n_spot)},
            "accepted": [False, False],
            "att": [att, att],
        },
    }


def test_scale_qmin_outlives_spot_and_main_qmin():
    """The r9 regression: the accepted scale block shipped no per-query
    evidence. With a budget that forces q_min drops, scale.q_min must
    be the LAST q_min standing — pin both the drop ORDER and the
    behavior at the exact budget where main q_min has just gone."""
    drops = build_drop_order(True, True, True)
    assert drops.index(("scale", "q_min")) > drops.index(("q_min",))
    assert drops.index(("q_min",)) > drops.index(("spot", "q_min"))
    assert drops.index(("spot", "q_min")) > drops.index(("spot", "q_min_scale"))
    # behavioral: find the serialized size right after the main q_min
    # drop (everything before scale.q_min shed) and use it as budget
    probe = _fat_compact()
    for d in drops[: drops.index(("q_min",)) + 1]:
        node = probe
        for k in d[:-1]:
            node = node.get(k, {})
        node.pop(d[-1], None)
    budget = len(json.dumps(probe, separators=(",", ":")))
    compact = _fat_compact()
    rec = json.loads(shrink_to_budget(compact, drops, budget=budget))
    assert "q_min" in rec["scale"], "scale.q_min must survive the longest"
    assert "q_min" not in rec.get("spot", {})
    assert "q_min_scale" not in rec.get("spot", {})
    assert "q_min" not in rec  # main q_min goes before scale's


def test_accepted_blocks_shed_attempts_first():
    """When every gate passed, attempt histories are redundant and must
    be the first fields dropped — before any q_min."""
    drops = build_drop_order(True, True, True)
    assert drops[:3] == [("spot", "att"), ("att",), ("scale", "att")]
    # behavioral: with a budget reachable by the att drops alone, the
    # shrink must stop there — every per-query min retained
    probe = _fat_compact(n_main=18, n_scale=18, n_spot=8, n_att=2)
    for d in drops[:3]:
        node = probe
        for k in d[:-1]:
            node = node.get(k, {})
        node.pop(d[-1], None)
    budget = len(json.dumps(probe, separators=(",", ":")))
    compact = _fat_compact(n_main=18, n_scale=18, n_spot=8, n_att=2)
    line = shrink_to_budget(compact, drops, budget=budget)
    rec = json.loads(line)
    assert len(line) <= budget
    assert "q_min" in rec and "q_min" in rec["scale"]
    assert "q_min" in rec["spot"] and "ratio" in rec["spot"]
    assert "att" not in rec and "att" not in rec["scale"]


def test_all_attempt_histories_shed_before_any_qmin():
    """r14 verdict item 1 (reverses the r8-era preference): attempt
    triples are forensics, per-query mins are the driver's comparison
    contract — EVERY att field (accepted or rejected blocks alike)
    must be dropped before any q_min map. Each block's headline
    steal/probe fields survive regardless, so an accepted:false block
    still carries environment evidence."""
    drops = build_drop_order(False, False, False)
    last_att = max(
        drops.index(("att",)),
        drops.index(("scale", "att")),
        drops.index(("spot", "att")),
    )
    for qmin_field in (
        ("spot", "q_min_scale"),
        ("spot", "q_min"),
        ("q_min",),
        ("scale", "q_min"),
    ):
        assert drops.index(qmin_field) > last_att


def test_headline_qmin_survives_r14_shape():
    """Regression pin for PERF_r14's n_common=0: the canonical r14 line
    (headline+scale accepted, spot sf1 half rejected with escalated
    attempt histories) over-ran the budget and shed the top-level
    q_min while the rejected spot block's att triples survived. With
    the rebuilt order, q_min and scale.q_min must both survive the
    REAL budget for the real r14 shape (actual query-name lengths —
    the _fat_compact 42-char synthetic names are the doomsday case
    where shedding q_min is genuinely unavoidable)."""
    headline = [
        "ann_cosine_topk", "corpus_curation_pipeline", "cube_status_priority",
        "daily_rollup", "incremental_dedup_fixed_delta",
        "incremental_minhash_dedup", "join_snowflake_rollup",
        "knn_user_recommend", "minhash_dedup_verified",
        "parquet_partitioned_roundtrip", "percentile_prices",
        "pricing_summary", "sessionize_batch", "simhash_neardup_pairs",
        "simhash_neardup_summary", "simhash_neardup_topk_per_doc",
        "text_quality", "topk_days_per_user",
    ]
    spot_names = [
        "pagerank_cosupply_top20", "triangle_count_cosupply",
        "triangle_count_sampled", "join_key_skew_profile",
        "referential_integrity_audit", "robust_outlier_mad",
        "table_checksum_audit", "table_diff_audit",
    ]
    att2 = [[19.868, 909, 1.46], [21.1, 1200, 1.5]]
    att3 = [[118.11, 52131, 1.06], [68.369, 27907, 1.31], [49.679, 10810, 1.1]]
    compact = {
        "metric": "headline_summary", "value": 19.868, "unit": "sec",
        "sf": 0.1, "probe": 1.46, "steal": 909, "accepted": True,
        "att": att2, "normalized": 12.38, "n_queries": 18,
        "trailing_flags": headline[:4], "memo": headline[:7],
        "q_min": {n: 1.23 for n in headline},
        "scale": {
            "value": 32.156, "probe": 0.99, "steal": 313, "accepted": True,
            "att": att2, "trailing_flags": headline[:3],
            "memo": headline[:7], "q_min": {n: 4.56 for n in headline},
        },
        "spot": {
            "round": 14, "names": spot_names,
            "ratio": {n: 1.5 for n in spot_names},
            "q_min": {n: 3.3 for n in spot_names},
            "q_min_scale": {n: 6.6 for n in spot_names},
            "accepted": [True, False], "att": [att2, att3],
        },
    }
    drops = build_drop_order(True, True, False)
    rec = json.loads(shrink_to_budget(compact, drops, budget=TAIL_BUDGET))
    assert "q_min" in rec, "headline q_min is the driver's comparison contract"
    assert "q_min" in rec["scale"]


def test_doomsday_always_fits_real_budget():
    """Exhausting the drop list must always land under the REAL budget
    (r9 advice: the old list could be exhausted with the line still
    over the window) — even for an absurd 5-attempt triple-block line."""
    compact = _fat_compact(n_main=30, n_scale=30, n_spot=8, n_att=5)
    drops = build_drop_order(False, False, False)
    line = shrink_to_budget(compact, drops, budget=TAIL_BUDGET)
    assert len(line) <= TAIL_BUDGET
    rec = json.loads(line)
    # the never-dropped decision-grade core survives
    for k in ("metric", "value", "accepted", "probe", "steal", "normalized"):
        assert k in rec
    assert rec["spot"]["names"], "spot names are never dropped"


def test_under_budget_drops_nothing():
    compact = _fat_compact(n_main=2, n_scale=2, n_spot=2, n_att=1)
    before = json.dumps(compact, separators=(",", ":"))
    line = shrink_to_budget(compact, build_drop_order(True, True, True))
    assert line == before


def _spot_rec(rnd, names, accepted):
    return {"spot": {"round": rnd, "names": names, "accepted": accepted}}


def test_spotlight_rejected_scale_half_is_not_coverage():
    """r12 lesson: a spot block whose sf1 half failed the noise gate
    published contaminated mins — its batch must re-enter the queue.
    Main-half rejection alone does NOT uncover (min-of-attempts), and
    legacy records without an accepted list stay covered."""
    from bench import spotlight_seen

    records = [
        _spot_rec(9, ["a", "b"], [True, True]),
        _spot_rec(10, ["c", "d"], [False, True]),  # main rejected: covered
        _spot_rec(12, ["e", "f"], [True, False]),  # scale rejected: NOT
        {"spot": {"round": 7, "names": ["g"]}},  # legacy, no accepted
        {"metric": "headline_summary"},  # no spot block at all
    ]
    seen = spotlight_seen(records)
    assert seen == {"a": 9, "b": 9, "c": 10, "d": 10, "g": 7}
    # a later ACCEPTED re-spot restores coverage at the new round
    records.append(_spot_rec(13, ["e", "f"], [True, True]))
    assert spotlight_seen(records)["e"] == 13


def test_spotlight_names_fall_back_to_ratio_keys():
    from bench import spotlight_seen

    rec = {"spot": {"round": 11, "ratio": {"x": 1.2}, "accepted": [True, True]}}
    assert spotlight_seen([rec]) == {"x": 11}
