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
