"""Cost-based-optimizer join reordering under ANALYZE TABLE statistics.

The one §4 optimizer lever not already plan-pinned elsewhere (pushdown,
broadcast selection, shuffle-hash, AQE skew split, runtime bloom filter,
DPP all have executed-plan proofs): with column statistics, Catalyst's
CostBasedJoinReorder rewrites a written-order join tree so the
selectively-filtered dimension joins FIRST and the large fact joins
last — at 100 TB the difference between shuffling the whole fact into
the first join and shuffling a pre-shrunk intermediate.

Uses catalog tables (CBO stats live in the metastore, not on parquet
paths) on a session fork; broadcast is disabled so join ORDER, not join
strategy, is the observable.
"""

from __future__ import annotations

import pytest


def _optimized(s, q: str) -> str:
    return s.sql(q)._jdf.queryExecution().optimizedPlan().toString()


def _first_idx(plan: str, name: str) -> int:
    i = plan.find(name)
    assert i >= 0, f"{name} not in plan:\n{plan}"
    return i


QUERY = """
SELECT c.c_name, count(*) AS n
FROM cbo_lineitem l
JOIN cbo_orders o ON o.o_orderkey = l.l_orderkey
JOIN cbo_customer c ON c.c_custkey = o.o_custkey
WHERE c.c_mktsegment = 'BUILDING' AND c.c_acctbal > 9000
GROUP BY c.c_name
"""


@pytest.fixture(scope="module")
def cbo_session(spark):
    import shutil
    from urllib.parse import urlparse

    s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    sf = "/root/testdata/sf0.001"
    wh = urlparse(s.conf.get("spark.sql.warehouse.dir")).path
    for t in ("lineitem", "orders", "customer"):
        # a managed-table location surviving a previous session's
        # metastore is a hard error for saveAsTable — clear both layers
        s.sql(f"DROP TABLE IF EXISTS cbo_{t}")
        shutil.rmtree(f"{wh}/cbo_{t}", ignore_errors=True)
        s.read.parquet(f"{sf}/{t}.parquet").write.saveAsTable(f"cbo_{t}")
        s.sql(f"ANALYZE TABLE cbo_{t} COMPUTE STATISTICS FOR ALL COLUMNS")
    yield s
    for t in ("lineitem", "orders", "customer"):
        s.sql(f"DROP TABLE IF EXISTS cbo_{t}")
        shutil.rmtree(f"{wh}/cbo_{t}", ignore_errors=True)


def test_cbo_reorders_selective_dim_first(cbo_session):
    s = cbo_session
    s.conf.set("spark.sql.cbo.enabled", "false")
    off = _optimized(s, QUERY)
    s.conf.set("spark.sql.cbo.enabled", "true")
    s.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    on = _optimized(s, QUERY)

    # Without stats-based reordering the tree is the written left-deep
    # order: (lineitem ⋈ orders) ⋈ customer — lineitem prints first.
    assert _first_idx(off, "cbo_lineitem") < _first_idx(off, "cbo_customer")
    # With CBO the filtered customer joins orders BEFORE the fact table
    # enters: lineitem moves to the outermost join and prints last.
    assert off != on
    assert _first_idx(on, "cbo_customer") < _first_idx(on, "cbo_lineitem")
    assert _first_idx(on, "cbo_orders") < _first_idx(on, "cbo_lineitem")
    # the Filter still sits on the customer scan in both plans
    assert "BUILDING" in on

    # reordering is a pure optimization: results identical
    rows_on = sorted(map(tuple, s.sql(QUERY).collect()))
    s.conf.set("spark.sql.cbo.enabled", "false")
    rows_off = sorted(map(tuple, s.sql(QUERY).collect()))
    assert rows_on == rows_off and len(rows_on) > 0


def test_analyze_populates_column_stats(cbo_session):
    s = cbo_session
    desc = s.sql(
        "DESCRIBE EXTENDED cbo_customer c_acctbal"
    ).collect()
    info = {r["info_name"]: r["info_value"] for r in desc}
    assert info.get("distinct_count") not in (None, "NULL")
    assert info.get("max") not in (None, "NULL")
