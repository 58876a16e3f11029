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


def test_run_concurrently_max_workers_override(spark):
    """A call site may widen the cap past MAX_CONCURRENT_FITS (r15: the
    4-branch cluster ensemble runs one wave at cap 4); the default cap
    still applies when the override is absent."""
    import threading
    import time

    def make(barrier):
        def t():
            # every thunk must reach the barrier together — only
            # possible when all 4 run concurrently
            barrier.wait(timeout=5)
            return threading.get_ident()

        return t

    barrier = threading.Barrier(4)
    ids = run_concurrently([make(barrier) for _ in range(4)], spark, max_workers=4)
    assert len(set(ids)) == 4


def test_scaled_state_partitions_derive_from_bytes(spark, tmp_path):
    """Size-derived state partitioning (r15, guide §2 'derive from
    input size'): floor for tiny inputs, grows with bytes, capped at
    the session default — never a constant, never the core count."""
    from big_data_competition_dxc_spark.streaming.confscope import (
        scaled_state_partitions,
        scaled_state_scope,
    )

    small = tmp_path / "small.bin"
    small.write_bytes(b"x" * 1024)  # 1 KiB -> floor
    assert scaled_state_partitions(spark, str(small)) == 4

    big = tmp_path / "big.bin"
    big.write_bytes(b"x" * (9 << 20))  # 9 MiB / 4 MiB advisory -> 3 < floor 4
    assert scaled_state_partitions(spark, str(big)) == 4
    # grows with bytes once past the floor (still capped at the default)
    default = int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert scaled_state_partitions(
        spark, str(big), advisory_bytes=1 << 20
    ) == min(9, default)
    huge_n = scaled_state_partitions(spark, str(big), advisory_bytes=1)
    assert huge_n == default

    # directory inputs are walked; the scope sets and restores the conf
    key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(key)
    with scaled_state_scope(spark, str(tmp_path)):
        assert spark.conf.get(key) == "4"
    assert spark.conf.get(key) == prev
