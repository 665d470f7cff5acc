"""Streaming query scratch-state cleanup (ADVICE r4).

Each streamops query replays input through a tempdir + memory sink;
repeated runs in one long-lived session must not accumulate disk or
temp views. The helper removes the replay/checkpoint dir eagerly and
drops the previous run's memory-sink view when the next run registers
(the latest view must survive — the driver collects it after return).
"""

from __future__ import annotations

import os

from tests.conftest import SF_DIR


def test_q73_rerun_drops_prior_view_and_tmpdir(spark):
    from anti_ddos_spark.queries import streamops

    out1 = streamops.q73_streaming_dedup(spark, SF_DIR)
    name1 = streamops._prior_views["q73_digests"]
    n1 = out1.count()
    assert n1 > 0

    out2 = streamops.q73_streaming_dedup(spark, SF_DIR)
    name2 = streamops._prior_views["q73_digests"]
    assert name2 != name1
    # prior view dropped, latest still collectable
    assert not any(t.name == name1 for t in spark.catalog.listTables())
    assert any(t.name == name2 for t in spark.catalog.listTables())
    assert out2.count() == n1


def test_finish_stream_run_removes_tmpdir(tmp_path, spark):
    from anti_ddos_spark.queries.streamops import _finish_stream_run

    scratch = tmp_path / "scratch"
    scratch.mkdir()
    (scratch / "ckpt").mkdir()
    (scratch / "ckpt" / "offsets").write_text("x")
    _finish_stream_run(spark, str(scratch), "qxx_test_0")
    assert not os.path.exists(scratch)
