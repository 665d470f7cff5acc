"""Every registered query vs its DuckDB oracle, at the driver's sf."""

from __future__ import annotations

import pytest

from conftest import SF_DIR_ORACLE
from oracle_utils import compare, duck_for

from anti_ddos_spark.queries import DRIVER_QUERY_CAP, full_registry, registry

# Local tests run the FULL surface (driver registry + demoted twins).
REG = full_registry()
ORACLE_CHECKED = sorted(
    n for n, q in REG.items() if q.sql is not None or q.sql_fn is not None
)
ROWS_ONLY = sorted(
    n for n, q in REG.items() if q.sql is None and q.sql_fn is None
)


def test_driver_registry_fits_cap_and_orders_critical_queries_first():
    """Round 2 lesson: the driver records CORRECTNESS rows for at most the
    first 50 registry entries in dict order — q25/q26/q60-q62 silently got
    no row. Pin the invariants that prevent a regression. (q61/q62 were
    DELIBERATELY rotated out in round 8 — r7 verdict task #2, and q26
    in round 13's ninth rotation — and now live in EXTRA_QUERIES with
    their oracles; the invariant is that an accidental reorder can't
    push a driver row past the cap, and that a demoted row keeps its
    oracle.)"""
    names = list(registry())
    assert len(names) <= DRIVER_QUERY_CAP
    for must_have in ("q25_asof_join", "q60_media_profile"):
        assert must_have in names[:DRIVER_QUERY_CAP]
    full = full_registry()
    for demoted in (
        "q26_range_join", "q61_media_features", "q62_frame_sample"
    ):
        assert demoted not in names
        assert full[demoted].sql is not None


@pytest.fixture(scope="module")
def duck_oracle():
    con = duck_for(SF_DIR_ORACLE)
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLE_CHECKED)
def test_query_matches_oracle(spark, duck_oracle, name):
    q = REG[name]
    df = q.fn(spark, SF_DIR_ORACLE)
    # model-dependent oracles (q122) generate their SQL from fitted state
    sql = q.sql if q.sql is not None else q.sql_fn(spark, SF_DIR_ORACLE)
    compare(df, duck_oracle, sql, name)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(spark, name):
    q = REG[name]
    df = q.fn(spark, SF_DIR_ORACLE)
    assert df.count() >= 0 and len(df.columns) > 0
