"""bench.py --diff (r11 verdict task #8): the mechanized
round-over-round sweep comparison. Pure-python — no Spark session."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from bench import run_diff  # noqa: E402


def _write(tmp_path, name, payload):
    p = str(tmp_path / name)
    with open(p, "w") as f:
        json.dump(payload, f)
    return p


def test_diff_flags_regressions_on_regress_on_columns(tmp_path, capsys):
    a = _write(tmp_path, "a.json", {
        "queries_batch_normalized": {"q01": 0.10, "q02": 1.00, "q03": 0.02},
        "queries_streaming_marginal_normalized": {"q70": 8.0, "q73": 1.0},
        "queries_streaming_marginal": {"q70": 9.0, "q73": 1.2},
    })
    b = _write(tmp_path, "b.json", {
        # q02 +60% (flag), q01 +20% (under threshold), q03 +100% but
        # absolute move 0.02 — under the 0.05 floor, never flagged
        "queries_batch_normalized": {"q01": 0.12, "q02": 1.60, "q03": 0.04},
        # q70 +50% (flag); q73 +0.3 — relative 30% but under the 0.5 s
        # absolute floor
        "queries_streaming_marginal_normalized": {"q70": 12.0, "q73": 1.3},
        "queries_streaming_marginal": {"q70": 13.0, "q73": 1.5},
    })
    run_diff(a, b, threshold=0.25)
    out = capsys.readouterr().out
    result = json.loads(out.strip().splitlines()[-1])
    assert [r["query"] for r in result["batch"]["flagged"]] == ["q02"]
    assert result["streaming"]["column"] == (
        "queries_streaming_marginal_normalized"
    )
    assert [r["query"] for r in result["streaming"]["flagged"]] == ["q70"]
    assert "FLAG q02" in out and "FLAG q70" in out
    assert "q03" not in [r["query"] for r in result["batch"]["flagged"]]


def test_diff_falls_back_to_raw_marginal_when_one_side_predates(
    tmp_path, capsys
):
    a = _write(tmp_path, "a.json", {
        "queries_batch_normalized": {"q01": 0.10},
        # r10-era artifact: no normalized streaming column
        "queries_streaming_marginal": {"q70": 5.0},
    })
    b = _write(tmp_path, "b.json", {
        "queries_batch_normalized": {"q01": 0.10},
        "queries_streaming_marginal_normalized": {"q70": 11.0},
        "queries_streaming_marginal": {"q70": 12.0},
    })
    run_diff(a, b, threshold=0.25)
    out = capsys.readouterr().out
    result = json.loads(out.strip().splitlines()[-1])
    # like compared with like: both sides use the raw marginal
    assert result["streaming"]["column"] == "queries_streaming_marginal"
    assert [r["query"] for r in result["streaming"]["flagged"]] == ["q70"]
    assert result["streaming"]["flagged"][0]["a"] == 5.0
    assert result["streaming"]["flagged"][0]["b"] == 12.0


def test_diff_prefers_batch_hostnorm_when_both_sides_carry_it(
    tmp_path, capsys
):
    """r12 verdict task #2: the batch half regresses on the
    host-normalized seconds column when both artifacts have it (with
    the 0.5 s seconds floor), immune to anchor-mean swings."""
    a = _write(tmp_path, "a.json", {
        "queries_batch_hostnorm": {"q01": 2.0, "q03": 0.10},
        "queries_batch_normalized": {"q01": 0.10, "q03": 0.01},
    })
    b = _write(tmp_path, "b.json", {
        # q01 +100% and +2.0 s -> flag; q03 +100% but 0.1 s, under the
        # 0.5 s seconds floor -> never flagged
        "queries_batch_hostnorm": {"q01": 4.0, "q03": 0.20},
        "queries_batch_normalized": {"q01": 0.20, "q03": 0.02},
    })
    run_diff(a, b, threshold=0.25)
    out = capsys.readouterr().out
    result = json.loads(out.strip().splitlines()[-1])
    assert result["batch"]["column"] == "queries_batch_hostnorm"
    assert [r["query"] for r in result["batch"]["flagged"]] == ["q01"]


def test_diff_batch_hostnorm_falls_back_like_for_like(tmp_path, capsys):
    a = _write(tmp_path, "a.json", {
        # r11-era artifact: no hostnorm column
        "queries_batch_normalized": {"q01": 0.10},
    })
    b = _write(tmp_path, "b.json", {
        "queries_batch_hostnorm": {"q01": 9.9},
        "queries_batch_normalized": {"q01": 0.30},
    })
    run_diff(a, b, threshold=0.25)
    out = capsys.readouterr().out
    result = json.loads(out.strip().splitlines()[-1])
    assert result["batch"]["column"] == "queries_batch_normalized"
    assert result["batch"]["flagged"][0]["a"] == 0.10
    assert result["batch"]["flagged"][0]["b"] == 0.30


def test_diff_streaming_history_band_suppresses_known_scatter(
    tmp_path, capsys
):
    """r12 verdict task #8: a streaming row whose new value sits inside
    its own history band ([min,max] over sibling BENCH_ALL_r*.json,
    padded 25%) is not flagged even when the pairwise delta screams;
    a value OUTSIDE the band still flags."""
    # history: q70 has scattered 3.0-11.0 across rounds (the measured
    # 1.4-4.6x class); q129 has been stable at 2.0-2.2
    _write(tmp_path, "BENCH_ALL_r10.json", {
        "queries_streaming_marginal_normalized": {"q70": 3.0, "q129": 2.0},
    })
    _write(tmp_path, "BENCH_ALL_r11.json", {
        "queries_streaming_marginal_normalized": {"q70": 11.0, "q129": 2.2},
    })
    a = _write(tmp_path, "a.json", {
        "queries_streaming_marginal_normalized": {"q70": 4.0, "q129": 2.1},
        "queries_streaming_marginal": {"q70": 5.0, "q129": 2.5},
    })
    b = _write(tmp_path, "b.json", {
        # q70 +150% pairwise but 10.0 is inside [2.25, 13.75] -> band
        # suppresses; q129 +181% and 5.9 is outside [1.5, 2.75] -> FLAG
        "queries_streaming_marginal_normalized": {"q70": 10.0, "q129": 5.9},
        "queries_streaming_marginal": {"q70": 11.0, "q129": 6.3},
    })
    run_diff(a, b, threshold=0.25)
    out = capsys.readouterr().out
    result = json.loads(out.strip().splitlines()[-1])
    assert [r["query"] for r in result["streaming"]["flagged"]] == ["q129"]
    in_band = [
        r for r in result["streaming"]["top_deltas"] if r.get("in_band")
    ]
    assert [r["query"] for r in in_band] == ["q70"]
    assert "band q70" in out and "FLAG q129" in out
