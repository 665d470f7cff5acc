"""Property-based flow-feature invariants (SURVEY §5).

Random packet sets → the declared invariants must hold for every flow
row, and the window-based and array-based implementations must agree.
Few examples (Spark round-trip per example is ~seconds) but each checks
~15 invariants over every emitted flow.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings, strategies as st

from anti_ddos_spark.schemas import PACKET_SCHEMA
from anti_ddos_spark.sessionize import flow_features
from anti_ddos_spark.streaming.sessionize_stream import flow_features_arrayagg

BASE = dt.datetime(2024, 1, 1)


@st.composite
def packet_batches(draw):
    n_flows = draw(st.integers(1, 3))
    rows = []
    for f in range(n_flows):
        n = draw(st.integers(1, 6))
        is_tcp = draw(st.booleans())
        t_off = draw(st.floats(0, 100, allow_nan=False))
        for p in range(n):
            t_off += draw(st.floats(0.0001, 30, allow_nan=False))
            fwd = p == 0 or draw(st.booleans())
            length = draw(st.integers(40, 1600))
            flag = lambda: draw(st.sampled_from([0, 0, 1, None])) if is_tcp else None  # noqa: E731
            rows.append(
                dict(
                    timestamp=BASE + dt.timedelta(seconds=t_off),
                    src_ip=f"10.0.0.{f}" if fwd else "10.0.1.1",
                    dst_ip="10.0.1.1" if fwd else f"10.0.0.{f}",
                    length=length,
                    protocol=6 if is_tcp else 17,
                    src_port=(1024 + f) if fwd else 80,
                    dst_port=80 if fwd else (1024 + f),
                    udp_len=None if is_tcp else length - 28,
                    tcp_seq=p if is_tcp else None,
                    tcp_ack=None,
                    tcp_win=draw(st.sampled_from([1024, 65535, None])) if is_tcp else None,
                    tcp_len=(length - 40) if is_tcp else None,
                    cwr_flag=flag(), ece_flag=flag(), urg_flag=flag(),
                    ack_flag=flag(), psh_flag=flag(), rst_flag=flag(),
                    syn_flag=flag(), fin_flag=flag(),
                )
            )
    rows.sort(key=lambda r: r["timestamp"])
    return rows


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(packet_batches())
def test_flow_feature_invariants(spark, rows):
    df = spark.createDataFrame(rows, PACKET_SCHEMA)
    flows = flow_features(df, gap_s=60).collect()
    assert flows, "no flow rows emitted"
    assert sum(r["total_fwd_packets"] + r["total_backward_packets"] for r in flows) == len(rows)
    for r in flows:
        n = r["total_fwd_packets"] + r["total_backward_packets"]
        assert n > 0 and r["total_fwd_packets"] >= 1  # first packet defines fwd
        # length invariants (means are int-floored: min ≤ floor(mean) ≤ max)
        assert r["min_packet_length"] <= r["packet_length_mean"] <= r["max_packet_length"]
        if r["total_fwd_packets"] > 0:
            assert r["fwd_packet_length_min"] <= r["fwd_packet_length_mean"] <= r["fwd_packet_length_max"]
        if r["total_backward_packets"] > 0:
            assert r["bwd_packet_length_min"] <= r["bwd_packet_length_mean"] <= r["bwd_packet_length_max"]
        # sums decompose
        assert (
            r["total_length_of_fwd_packets"] + r["total_length_of_bwd_packets"]
            == (r["min_packet_length"] if n == 1 else r["total_length_of_fwd_packets"] + r["total_length_of_bwd_packets"])
        )
        # rates and IATs are non-negative; iat_min ≤ iat_mean ≤ iat_max
        for c in ("flow_bytes_s", "flow_packets_s", "fwd_packets_s", "bwd_packets_s"):
            assert r[c] >= 0
        assert r["flow_iat_min"] <= r["flow_iat_mean"] <= r["flow_iat_max"] or n <= 1
        # flag counts bounded by packet count
        for c in ("fin", "syn", "rst", "psh", "ack", "urg", "cwe", "ece"):
            assert 0 <= r[f"{c}_flag_count"] <= n
        # subflow aliases mirror totals (reference semantics)
        assert r["subflow_fwd_packets"] == r["total_fwd_packets"]
        assert r["subflow_bwd_bytes"] == r["total_length_of_bwd_packets"]


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(packet_batches())
def test_window_and_array_paths_agree(spark, rows):
    df = spark.createDataFrame(rows, PACKET_SCHEMA)
    cols = [f.name for f in df.schema.fields]  # just to touch schema
    a = flow_features(df, gap_s=60)
    b = flow_features_arrayagg(df, gap_s=60)
    cols = a.columns
    fuzzy = {i for i, c in enumerate(cols) if "std" in c or "variance" in c}
    ra = sorted(tuple(str(v) for v in r) for r in a.select(*cols).collect())
    rb = sorted(tuple(str(v) for v in r) for r in b.select(*cols).collect())
    assert len(ra) == len(rb)
    for ta, tb in zip(ra, rb):
        for i, (va, vb) in enumerate(zip(ta, tb)):
            if va == vb:
                continue
            assert i in fuzzy and abs(int(va) - int(vb)) <= 1, f"{cols[i]}: {va} != {vb}"
