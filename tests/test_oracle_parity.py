"""Local mirror of the driver's t2 correctness gate: run every
oracle-paired query in the registry through Spark AND DuckDB on the same
parquet fixtures, then compare row count, schema (column names), and
order-insensitive values."""

from __future__ import annotations

import math

import pytest

from big_data_competition_dxc_spark import plans

from conftest import SF_TEST_DIR

plans.load_all()

ORACLE_QUERIES = sorted(n for n, e in plans.QUERIES.items() if e.oracle is not None)


def _canon(val):
    if val is None:
        return "NULL"
    if isinstance(val, float):
        if math.isnan(val):
            return "NaN"
        # repr, not the raw float: scripts/driver_sim.py canonicalizes
        # the same way, and a column mixing NULLs with floats must stay
        # sortable (str vs float tuples raise TypeError — hit by
        # incremental_dedup_fixed_delta's nullable best_jaccard)
        return repr(round(val, 9))
    if isinstance(val, (list, tuple)):
        return tuple(_canon(v) for v in val)
    return str(val)


def _rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_matches_duckdb_oracle(name, spark, duck):
    entry = plans.QUERIES[name]
    sdf = entry.fn(spark, SF_TEST_DIR)
    # Driver-canonicalizer guard: the driver's pandas sort_values raises
    # TypeError on list/dict cells, so every oracle-paired query must
    # emit a scalar-only top-level schema (arrays leave queries as
    # sorted comma-joined strings or posexploded rows).
    for field in sdf.schema.fields:
        assert field.dataType.typeName() not in (
            "array",
            "map",
            "struct",
            "variant",
            "binary",
        ), f"{name}: non-scalar top-level column {field.name}"
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    rel = duck.execute(entry.oracle)
    duck_cols = [d[0] for d in rel.description]
    duck_rows = rel.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={spark_cols} duck={duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: rowcount spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    srs = _rowset(spark_cols, spark_rows)
    drs = _rowset(duck_cols, duck_rows)
    if srs != drs:
        diff = [(a, b) for a, b in zip(srs, drs) if a != b][:5]
        pytest.fail(f"{name}: value mismatch, first diffs: {diff}")
