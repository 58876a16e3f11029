"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``big_data_competition_dxc_spark.plans`` — the query
registry is the single source of truth; every operator from SURVEY.md §2
registers a ``queries()`` entry there and, when SQL-expressible, a DuckDB
``oracle_sql()`` twin.
"""

from __future__ import annotations

import glob
import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from big_data_competition_dxc_spark import plans

plans.load_all()


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
       anything new is);
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
            if not isinstance(rec, dict):
                latest[name] = True
                continue
            # rows-only queries record the sentinel err='no_oracle' on a
            # SUCCESSFUL run (spark_rows non-null) — only a real
            # traceback/failure counts as stale-err.
            errored = bool(rec.get("err")) and rec.get("err") != "no_oracle"
            # any recorded False verdict is a failure; None (rows-only
            # sentinel) is not.
            mismatched = any(
                rec.get(k) is False
                for k in ("rows_match", "schema_match", "hash_match")
            )
            latest[name] = errored or mismatched
            latest_round[name] = _round_no(path)
    # Queries whose published contract (result schema or oracle) changed
    # in a given round: a green row recorded BEFORE that round proves
    # nothing about the new contract, so they rank with stale-fail until
    # the driver samples them at or after the bump round (a static set
    # would pin them to the window head forever). Maintained by hand
    # when a round edits a driver-green query.
    contract_bump_round = {
        "q12_priority_by_linestatus": 6,  # r6: sums CAST AS BIGINT, DATE window, TRIM
        "stratified_sample": 6,  # r6: seeded sampleBy -> deterministic hash threshold
        # its only driver record (r2) is the pre-pairing no_oracle
        # sentinel; the hash contract added later has never been
        # driver-proven, so force a sample at/after r7.
        "approx_distinct_check": 7,
        # r7: both gained an audited determinism-scalar column (schema
        # change) — re-prove the new shape under the driver.
        "ml_cluster_ensemble": 7,
        "ml_autoregressive_forecast": 7,
    }
    contract_bumped = {
        n
        for n, rnd in contract_bump_round.items()
        if latest_round.get(n, -1) < rnd
    }
    names = list(plans.QUERIES)
    stale_fail = [n for n in names if latest.get(n) or n in contract_bumped]
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
