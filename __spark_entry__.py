"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``big_data_competition_dxc_spark.plans`` — the query
registry is the single source of truth; every operator from SURVEY.md §2
registers a ``queries()`` entry there and, when SQL-expressible, a DuckDB
``oracle_sql()`` twin.
"""

from __future__ import annotations

import glob
import hashlib
import inspect
import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from big_data_competition_dxc_spark import plans

plans.load_all()

#: Sidecar recording, per query, the contract fingerprint that was
#: current when the driver last proved the query green. Written by
#: ``scripts/update_contracts.py`` (run at ROUND START, before any
#: edits, when the tree is still byte-identical to what the driver
#: tested); read by ``_rotation_order``.
CONTRACTS_FILE = "CONTRACTS.json"


def _fingerprint(entry: plans.QueryEntry) -> str:
    """Computed contract fingerprint: hash of the oracle SQL plus the
    query function's source. Any edit to either (schema aliases, new
    audited columns, a rewritten implementation) changes the hash, so
    a driver-green row recorded against the OLD fingerprint no longer
    vouches for the query — ``_rotation_order`` ranks it stale-fail
    until the driver re-proves it. Replaces the hand-maintained
    ``contract_bump_round`` dict, whose failure mode (a rewrite nobody
    remembered to bump — r7's stream_incremental_dedup) was exactly
    that it relied on a human noticing the change.

    Known granularity limit: only the REGISTERED function's source is
    hashed, so an edit to a shared helper it calls does not flip its
    callers (hashing whole modules would flip every query on any
    comment edit — worse). Helper edits therefore need a manual
    re-proof (scripts/driver_sim.py --only ...) in the editing round;
    the full-sweep regression net catches anything missed."""
    try:
        src = inspect.getsource(entry.fn)
    except (OSError, TypeError):  # builtins / REPL-defined: fall back
        src = repr(entry.fn)
    payload = (entry.oracle or "<rows-only>") + "\x00" + src
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


def _record_succeeded(rec: object) -> bool:
    """True if a CORRECTNESS record is a successful run: rows-only
    queries store the sentinel err='no_oracle' on SUCCESS; any recorded
    False verdict (the r5 q12 lesson: hash mismatch with err=null) or a
    real traceback is a failure."""
    if not isinstance(rec, dict):
        return False
    if rec.get("err") and rec.get("err") != "no_oracle":
        return False
    if any(
        rec.get(k) is False for k in ("rows_match", "schema_match", "hash_match")
    ):
        return False
    return rec.get("spark_rows") is not None


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's core
    pipeline shape (dedup -> pivoted daily rollup -> lag features),
    流行音乐趋势预测.md:42-98, as one Catalyst plan."""
    from big_data_competition_dxc_spark.operators.rollup import daily_user_rollup

    return daily_user_rollup(spark, "/root/testdata/sf0.001")


def _rotation_order(history_dir: str | None = None) -> list[str]:
    """Registry names ordered stale-err first, then never-driver-checked.

    The driver's correctness gate samples ~50 queries per round from the
    front of this dict; every query is verified locally regardless
    (tests/test_oracle_parity.py parametrizes all oracles), but the
    driver's independent check is the hard signal. Priority classes,
    derived from the recorded CORRECTNESS_r*.json history:

    1. queries whose LATEST driver record is a FAILURE — either a real
       `err` traceback or any of rows/schema/hash recorded False (the
       round-5 q12 lesson: a hash mismatch with err=null is just as
       red as a crash, and must be re-proven by the driver before
       anything new is) — and queries whose computed contract
       fingerprint no longer matches the one recorded in
       CONTRACTS.json at their last driver-green (edited since proven;
       see ``_fingerprint``);
    2. queries the driver has never sampled;
    3. everything already green, LEAST-RECENTLY-checked first (registry
       order as tie-break) — so the ~50-query window genuinely rotates
       through the registry instead of re-sampling the same green head
       every round.

    "Latest" wins by NUMERIC round (CORRECTNESS_r10 sorts after _r9
    even though it sorts before lexicographically).
    """
    latest: dict[str, bool] = {}  # name -> latest recorded run failed
    latest_round: dict[str, int] = {}  # name -> round of latest record

    def _round_no(path: str) -> int:
        stem = os.path.basename(path)
        digits = "".join(ch for ch in stem if ch.isdigit())
        return int(digits) if digits else -1

    here = history_dir or os.path.dirname(os.path.abspath(__file__))
    for path in sorted(
        glob.glob(os.path.join(here, "CORRECTNESS_r*.json")), key=_round_no
    ):
        try:
            with open(path) as f:
                records = json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(records, dict):
            # a truncated/legacy file (e.g. a bare list of names) must
            # degrade to "unknown history", never crash the driver's
            # queries() entry point
            continue
        for name, rec in records.items():
            latest[name] = not _record_succeeded(rec)
            latest_round[name] = _round_no(path)
    # Computed contract staleness (replaces the r3-r7 hand-maintained
    # contract_bump_round dict): CONTRACTS.json records, per query, the
    # fingerprint (oracle SQL + function source) that was current when
    # the driver last proved the query green. A query whose CURRENT
    # fingerprint differs was edited since its proof — its green row
    # vouches for code that no longer exists, so it ranks stale-fail
    # until the driver re-proves it (after which the round-start
    # updater re-stamps the sidecar and it rotates normally). Queries
    # with no sidecar entry (never driver-green, or pre-bootstrap) fall
    # through to the normal classes.
    contract_stale: set[str] = set()
    try:
        with open(os.path.join(here, CONTRACTS_FILE)) as f:
            contracts = json.load(f)
    except (OSError, ValueError):
        contracts = {}
    if isinstance(contracts, dict):
        for name, entry in plans.QUERIES.items():
            rec = contracts.get(name)
            if (
                isinstance(rec, dict)
                and rec.get("fingerprint")
                and rec["fingerprint"] != _fingerprint(entry)
            ):
                contract_stale.add(name)
    names = list(plans.QUERIES)
    stale_fail = [n for n in names if latest.get(n) or n in contract_stale]
    never = [n for n in names if n not in latest and n not in stale_fail]
    idx = {n: i for i, n in enumerate(names)}
    green = sorted(
        (n for n in names if latest.get(n) is False and n not in stale_fail),
        key=lambda n: (latest_round.get(n, 0), idx[n]),
    )
    return stale_fail + never + green


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: plans.QUERIES[name].fn for name in _rotation_order()}


def oracle_sql() -> dict[str, str]:
    return {
        name: plans.QUERIES[name].oracle
        for name in _rotation_order()
        if plans.QUERIES[name].oracle is not None
    }
