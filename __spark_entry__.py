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


def _rotation_order() -> list[str]:
    """Registry names ordered stale-err first, then never-driver-checked.

    The driver's correctness gate samples ~50 queries per round from the
    front of this dict; every query is verified locally regardless
    (tests/test_oracle_parity.py parametrizes all oracles), but the
    driver's independent check is the hard signal. Priority classes,
    derived from the recorded CORRECTNESS_r*.json history:

    1. queries whose LATEST driver record is an error — a query whose
       last audit-trail entry says `err` is indistinguishable from
       broken no matter how green the local suite is, so a fix must be
       re-proven by the driver before anything new is;
    2. queries the driver has never sampled;
    3. everything already green, in registry order (stable, so the
       window keeps rotating through the registry across rounds).
    """
    latest: dict[str, bool] = {}  # name -> latest recorded run errored
    here = os.path.dirname(os.path.abspath(__file__))
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
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
            # rows-only queries record the sentinel err='no_oracle' on a
            # SUCCESSFUL run (spark_rows non-null) — only a real
            # traceback/failure counts as stale-err.
            latest[name] = (
                isinstance(rec, dict)
                and bool(rec.get("err"))
                and rec.get("err") != "no_oracle"
            )
    names = list(plans.QUERIES)
    stale_err = [n for n in names if latest.get(n)]
    never = [n for n in names if n not in latest]
    green = [n for n in names if latest.get(n) is False]
    return stale_err + never + green


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: plans.QUERIES[name].fn for name in _rotation_order()}


def oracle_sql() -> dict[str, str]:
    return {
        name: plans.QUERIES[name].oracle
        for name in _rotation_order()
        if plans.QUERIES[name].oracle is not None
    }
