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
    # behavioral: find the serialized size right after the spot.ratio
    # drop (everything before scale.q_min shed) and use it as budget
    probe = _fat_compact()
    for d in drops[: drops.index(("spot", "ratio")) + 1]:
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


def test_rejected_blocks_keep_attempts_over_spot_mins():
    """accepted:false blocks carry their own environment evidence (r8
    verdict item 4): their att outlives the spotlight q_min maps."""
    compact = _fat_compact()
    drops = build_drop_order(False, False, False)
    i_att = drops.index(("att",))
    i_scale_att = drops.index(("scale", "att"))
    for spot_field in (("spot", "q_min_scale"), ("spot", "q_min")):
        assert drops.index(spot_field) < i_att
        assert drops.index(spot_field) < i_scale_att


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
