"""Pins for the r14 optimization internals: ml/concurrency.py's
thread-pool fit submission and streaming/confscope.py's scoped
state-partition override (OPTIMIZATION_r14.md)."""

from __future__ import annotations

import pytest

from big_data_competition_dxc_spark.ml.concurrency import (
    MAX_CONCURRENT_FITS,
    run_concurrently,
)
from big_data_competition_dxc_spark.streaming.confscope import (
    state_partitions_scope,
)


def test_results_preserve_input_order(spark):
    # Deliberately make earlier thunks slower: completion order is
    # reversed, result order must not be.
    import time

    def make(i):
        def t():
            time.sleep(0.2 * (3 - i))
            return i

        return t

    assert run_concurrently([make(i) for i in range(4)], spark) == [0, 1, 2, 3]


def test_single_thunk_runs_inline(spark):
    import threading

    main = threading.get_ident()
    assert run_concurrently([lambda: threading.get_ident()], spark) == [main]


def test_exceptions_propagate(spark):
    def boom():
        raise ValueError("fit failed")

    with pytest.raises(ValueError, match="fit failed"):
        run_concurrently([lambda: 1, boom, lambda: 2], spark)


def test_concurrency_cap_is_guides_number():
    # Guide §2.6: "2-3 jobs in flight is plenty"; the 218s RF outlier
    # at 5-way under throttle is why this must not silently grow.
    assert MAX_CONCURRENT_FITS == 3


def test_spark_actions_from_threads_are_correct(spark):
    counts = run_concurrently(
        [lambda n=n: spark.range(n).count() for n in (10, 20, 30, 40)], spark
    )
    assert counts == [10, 20, 30, 40]


def test_state_partitions_scope_restores_previous_value(spark):
    key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(key)
    with state_partitions_scope(spark, 7):
        assert spark.conf.get(key) == "7"
    assert spark.conf.get(key) == prev


def test_state_partitions_scope_restores_on_error(spark):
    key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(key)
    with pytest.raises(RuntimeError):
        with state_partitions_scope(spark, 7):
            raise RuntimeError("stream died")
    assert spark.conf.get(key) == prev
