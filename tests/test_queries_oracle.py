"""Every registered query vs its DuckDB oracle, at the driver's sf."""

from __future__ import annotations

import pytest

from conftest import SF_DIR_ORACLE
from oracle_utils import compare, duck_for

from anti_ddos_spark.queries import registry

REG = registry()
ORACLE_CHECKED = sorted(n for n, q in REG.items() if q.sql is not None)
ROWS_ONLY = sorted(n for n, q in REG.items() if q.sql is None)


@pytest.fixture(scope="module")
def duck_oracle():
    con = duck_for(SF_DIR_ORACLE)
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLE_CHECKED)
def test_query_matches_oracle(spark, duck_oracle, name):
    q = REG[name]
    df = q.fn(spark, SF_DIR_ORACLE)
    compare(df, duck_oracle, q.sql, name)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(spark, name):
    q = REG[name]
    df = q.fn(spark, SF_DIR_ORACLE)
    assert df.count() >= 0 and len(df.columns) > 0
