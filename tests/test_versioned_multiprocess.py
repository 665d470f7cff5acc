"""REAL multi-process concurrent committers (r9 verdict task #5).

The in-process conflict tests (test_versioned.py) exercise the
optimistic-concurrency API; this one proves the CRITICAL SECTION at the
level it actually defends: two independent OS processes (two "drivers")
publishing interleaved commits against one table root, each retrying
through CommitConflict. The publish protocol is pure filesystem
(flock + O_EXCL + atomic rename) — no Spark needed in the workers, so
this is the protocol under genuine preemption, not a simulation.

Invariants proved:
- no lost update: every commit either lands on the chain exactly once
  or surfaces as CommitConflict to its OWN process (which retries);
- the chain is a single linked list: version numbers strictly
  contiguous from 0, each manifest's base = previous version;
- append semantics compose across processes: the final resolved file
  list contains every worker's committed payload exactly once;
- contention is FORCED, not hoped for: a double barrier makes both
  processes read the SAME base before either publishes, so every round
  has exactly one optimistic loser retrying through CommitConflict
  (a tight race-and-hope loop proved flaky under a loaded box — the
  two processes can serialize and never collide).
"""

from __future__ import annotations

import multiprocessing as mp
import os

import pytest


@pytest.fixture(params=["local", "cas"])
def backend_env(request, monkeypatch):
    """Run the process-level races under BOTH publish backends (r10
    verdict task #7) — spawn children inherit os.environ, so the env
    var selects the backend inside _worker too. Under 'cas' there is
    NO flock serialization: both processes race straight to the
    conditional pointer flip, losers orphan a manifest and retry."""
    if request.param == "cas":
        monkeypatch.setenv("SPARK_GRAFT_PUBLISH_BACKEND", "cas")
    return request.param


N_COMMITS = 40


def _worker(root: str, wid: int, q, barrier=None) -> None:
    # runs in a separate OS process (spawn: clean interpreter)
    from anti_ddos_spark.sources.versioned import (
        CommitConflict,
        VersionedTable,
    )

    t = VersionedTable(root)
    conflicts = 0
    committed = []
    for i in range(N_COMMITS):
        if barrier is not None:
            barrier.wait(timeout=120)  # both about to read the base
        base = t.current_version()
        if barrier is not None:
            barrier.wait(timeout=120)  # both HAVE read the same base
        while True:
            try:
                v = t._publish(
                    [f"data/d-w{wid}-{i}/part-0.parquet"], "append", base
                )
                committed.append(v)
                break
            except CommitConflict:
                conflicts += 1
                base = t.current_version()
    q.put((wid, committed, conflicts))


def test_two_processes_interleave_commits_without_lost_updates(
    tmp_path, backend_env
):
    from anti_ddos_spark.sources.versioned import VersionedTable

    root = str(tmp_path / "tbl")
    t = VersionedTable(root)
    t._publish(["data/d-seed/part-0.parquet"], "overwrite", None)

    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    barrier = ctx.Barrier(2)
    ps = [
        ctx.Process(target=_worker, args=(root, wid, q, barrier))
        for wid in (1, 2)
    ]
    for p in ps:
        p.start()
    results = [q.get(timeout=300) for _ in ps]
    for p in ps:
        p.join(timeout=300)
        assert p.exitcode == 0

    total_conflicts = sum(r[2] for r in results)
    all_versions = sorted(v for r in results for v in r[1])

    # every commit landed exactly once
    assert len(all_versions) == len(set(all_versions)) == 2 * N_COMMITS
    assert t.current_version() == all_versions[-1]
    if backend_env == "local":
        # flock serializes the whole section: losers never write a
        # manifest, so numbering is the contiguous counter
        assert all_versions == list(range(1, 2 * N_COMMITS + 1))
        assert t.current_version() == 2 * N_COMMITS
    else:
        # CAS: a loser that reached the flip burned an ORPHAN number —
        # gaps are expected; every orphan is invisible to the chain and
        # there are at most as many as observed conflicts
        orphans = set(t.versions()) - set(all_versions) - {0}
        assert len(orphans) <= total_conflicts

    # the chain is one linked list over exactly the committed versions
    chain = t.committed_chain()
    assert [m["version"] for m in chain] == sorted(
        [0] + all_versions, reverse=True
    )
    for newer, older in zip(chain, chain[1:]):
        assert newer["base"] == older["version"]

    # append semantics composed: every worker file present exactly once
    files = t._resolved(t.current_version())["files"]
    assert len(files) == len(set(files)) == 2 * N_COMMITS + 1
    for wid in (1, 2):
        mine = [f for f in files if f"d-w{wid}-" in f]
        assert len(mine) == N_COMMITS

    # the race was real AND forced: both processes read the same base
    # every round, so each round's loser retried through CommitConflict
    # — one conflict per round (the loser's uncontended retry succeeds
    # while the winner waits at the next round's barrier)
    assert total_conflicts == N_COMMITS


def test_process_crash_mid_publish_leaves_walkable_chain(
    tmp_path, backend_env
):
    """A publisher killed AFTER writing its manifest but BEFORE the
    pointer flip leaves an ORPHAN: invisible to readers, never
    clobbered by the next allocation (O_EXCL skips it), and the chain
    stays walkable — the crash-safety half of the lock contract, at
    process level."""
    import json

    from anti_ddos_spark.sources.versioned import VersionedTable

    root = str(tmp_path / "tbl")
    t = VersionedTable(root)
    t._publish(["data/d-seed/part-0.parquet"], "overwrite", None)

    # simulate the crash window without patching library code in a
    # child: write the orphan manifest exactly as a dying publisher
    # would have left it (manifest present, pointer not flipped)
    orphan = {
        "base": 0,
        "mode": "append",
        "files": ["data/d-seed/part-0.parquet", "data/d-dead/part-0.parquet"],
        "version": 1,
    }
    with open(os.path.join(root, "manifests", "v1.json"), "w") as f:
        json.dump(orphan, f)
    assert t.current_version() == 0  # invisible

    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    p = ctx.Process(target=_worker, args=(root, 9, q))
    p.start()
    wid, committed, _ = q.get(timeout=300)
    p.join(timeout=300)
    assert p.exitcode == 0

    # the survivor allocated PAST the orphan (v1 skipped, never reused)
    assert committed[0] == 2
    assert t.current_version() == committed[-1]
    chain = t.committed_chain()
    assert 1 not in [m["version"] for m in chain]
    # and the orphan's file never leaked into the live snapshot
    files = t._resolved(t.current_version())["files"]
    assert not any("d-dead" in f for f in files)
