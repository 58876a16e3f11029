from __future__ import annotations

import os

import duckdb
import pytest

from big_data_competition_dxc_spark.sources import TABLES

SF_TEST_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from big_data_competition_dxc_spark.session import get_spark

    s = get_spark("bdc-dxc-tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_TEST_DIR}/{t}.parquet')"
        )
    yield con
    con.close()
