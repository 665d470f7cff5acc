"""Exact-mode features (SURVEY §2.4 dual-mode): the reference always
emits 0 for active/idle and init_win/min_seg (dead state fields,
main.py:938-939, :563-564); exact mode computes the real semantics.
Hand-computed fixture: two active runs separated by one 3 s idle gap.
"""

from __future__ import annotations

import datetime as dt

from anti_ddos_spark.schemas import PACKET_SCHEMA
from anti_ddos_spark.sessionize import flow_features

BASE = dt.datetime(2024, 1, 1)


def _pkt(off_s: float, fwd: bool, win: int):
    return dict(
        timestamp=BASE + dt.timedelta(seconds=off_s),
        src_ip="10.0.0.1" if fwd else "10.0.9.9",
        dst_ip="10.0.9.9" if fwd else "10.0.0.1",
        length=100,
        protocol=6,
        src_port=1234 if fwd else 80,
        dst_port=80 if fwd else 1234,
        udp_len=None,
        tcp_seq=int(off_s * 10),
        tcp_ack=None,
        tcp_win=win,
        tcp_len=60,
        cwr_flag=0, ece_flag=0, urg_flag=0, ack_flag=1,
        psh_flag=0, rst_flag=0, syn_flag=0, fin_flag=0,
    )


def test_exact_mode_active_idle_and_init_win(spark):
    rows = [
        _pkt(0.0, True, 8192),   # run 1 starts
        _pkt(0.2, False, 1024),
        _pkt(0.5, True, 4096),   # run 1 closes (next gap 3 s > 1 s)
        _pkt(3.5, True, 2048),   # run 2 starts
        _pkt(3.6, True, 2048),   # run 2 closes (session end)
    ]
    df = spark.createDataFrame(rows, PACKET_SCHEMA)
    flows = flow_features(df, gap_s=None, mode="exact").collect()
    assert len(flows) == 1
    r = flows[0]
    # one idle gap of exactly 3 s
    assert r["idle_mean"] == 3_000_000
    assert r["idle_max"] == 3_000_000 and r["idle_min"] == 3_000_000
    assert r["idle_std"] == 0
    # two active spans: 500 ms and 100 ms
    assert r["active_max"] == 500_000 and r["active_min"] == 100_000
    assert r["active_mean"] == 300_000
    assert r["active_std"] == 200_000  # population std of {500k, 100k}
    # real init_win / min_seg semantics (faithful mode pins these to 0)
    assert r["init_win_bytes_forward"] == 8192
    assert r["init_win_bytes_backward"] == 1024
    assert r["min_seg_size_forward"] == 20  # TCP header heuristic


def test_faithful_mode_zeroes_dead_features(spark):
    rows = [_pkt(0.0, True, 8192), _pkt(0.1, False, 1024)]
    df = spark.createDataFrame(rows, PACKET_SCHEMA)
    r = flow_features(df, gap_s=None, mode="faithful").collect()[0]
    for c in (
        "active_mean", "active_std", "active_max", "active_min",
        "idle_mean", "idle_std", "idle_max", "idle_min",
        "init_win_bytes_forward", "init_win_bytes_backward",
        "min_seg_size_forward",
    ):
        assert r[c] == 0, c
