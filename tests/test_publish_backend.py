"""PublishBackend contract (r10 verdict task #7): the object-store
port of the publish protocol as CODE. The local backend is today's
flock+O_EXCL+rename; CasEmulationBackend is the S3/GCS shape — no
advisory lock, if-none-match manifest create, conditional-PUT pointer
flip. The conflict/idempotency suites run over BOTH backends via the
parametrized fixtures in test_versioned*.py; this file pins the
CAS-specific behaviors those suites can't force deterministically:
the injectable lost race, orphaning, and lock-freedom."""

from __future__ import annotations

import os

import pytest

from anti_ddos_spark.sources.versioned import (
    CasEmulationBackend,
    CommitConflict,
    LocalPublishBackend,
    PublishBackend,
    VersionedTable,
)


def test_local_backend_is_the_default_and_the_base_class():
    t = VersionedTable.__new__(VersionedTable)  # no dirs needed
    assert LocalPublishBackend is PublishBackend
    del t


def test_cas_lost_race_orphans_manifest_and_raises(tmp_path):
    """A competing commit landing INSIDE the CAS window (after the
    loser's manifest exists, before its pointer flip) must make the
    flip lose: CommitConflict naming the orphaned manifest, the
    rival's version live, the loser's number burned but invisible,
    and a rebase retry succeeding with a fresh number."""
    root = str(tmp_path / "tbl")
    t = VersionedTable(root, backend=CasEmulationBackend())
    v0 = t._publish(["data/d-seed/p.parquet"], "overwrite", None)
    assert v0 == 0

    rival = VersionedTable(root, backend=CasEmulationBackend())

    def rival_commit():
        rival._publish(["data/d-rival/p.parquet"], "append", v0)

    loser = VersionedTable(
        root, backend=CasEmulationBackend(race_injector=rival_commit)
    )
    with pytest.raises(CommitConflict, match="orphaned"):
        loser._publish(["data/d-loser/p.parquet"], "append", v0)

    # loser allocated v1 first (O_EXCL), so the rival took v2 and won
    assert t.current_version() == 2
    committed = {m["version"] for m in t.committed_chain()}
    assert committed == {0, 2}
    assert set(t.versions()) - committed == {1}  # the orphan

    # rebase-and-retry lands on a fresh number; the orphan is skipped,
    # never clobbered
    v3 = loser._publish(
        ["data/d-loser/p.parquet"], "append", t.current_version()
    )
    assert v3 == 3
    assert {m["version"] for m in t.committed_chain()} == {0, 2, 3}
    files = t._resolved(3)["files"]
    assert "data/d-rival/p.parquet" in files
    assert "data/d-loser/p.parquet" in files


def test_cas_backend_never_takes_the_advisory_lock(tmp_path):
    """Object stores have no flock: the CAS backend's exclusive() is a
    no-op, so the _lock file the local backend creates never appears."""
    root = str(tmp_path / "tbl")
    t = VersionedTable(root, backend=CasEmulationBackend())
    t._publish(["data/d-a/p.parquet"], "overwrite", None)
    t._publish(["data/d-b/p.parquet"], "append", 0)
    assert not os.path.exists(os.path.join(root, "_lock"))

    # ...and the local backend does take it (same protocol, swapped
    # primitives)
    root2 = str(tmp_path / "tbl2")
    t2 = VersionedTable(root2, backend=LocalPublishBackend())
    t2._publish(["data/d-a/p.parquet"], "overwrite", None)
    assert os.path.exists(os.path.join(root2, "_lock"))


def test_cas_flip_requires_expected_base_even_from_none(tmp_path):
    """Seed race: two writers both publishing version 0 of a fresh
    table — the second flip's compare (expected_base=None vs live 0)
    must lose."""
    root = str(tmp_path / "tbl")
    first = VersionedTable(root, backend=CasEmulationBackend())

    def first_commit():
        first._publish(["data/d-first/p.parquet"], "overwrite", None)

    second = VersionedTable(
        root, backend=CasEmulationBackend(race_injector=first_commit)
    )
    with pytest.raises(CommitConflict):
        second._publish(["data/d-second/p.parquet"], "overwrite", None)
    # the winner's seed is live; exactly one committed version
    assert first.current_version() == 1  # loser burned v0 first
    assert [m["version"] for m in first.committed_chain()] == [1]


def test_vacuum_collects_cas_orphans_with_age_gate(spark, tmp_path):
    """r11 verdict task #5: lost CAS races orphan their manifests by
    design; over a long-lived table they accumulate and vacuum must
    collect them like expired chain manifests — but ONLY past the age
    gate, because under an object-store backend no lock excludes an
    in-flight commit whose manifest exists and whose pointer flip
    hasn't happened yet (deleting that young manifest would let the
    flip publish a pointer to nothing)."""
    import json as _json

    from anti_ddos_spark.sources.cdf import version_changes
    from anti_ddos_spark.sources.versioned import (
        streaming_cdc_committer,
        vacuum,
    )

    root = str(tmp_path / "tbl")
    t = VersionedTable(root, backend=CasEmulationBackend())
    sink = streaming_cdc_committer(t, "k", seq_col="seq", n_buckets=8)
    schema = "k long, v string, op string, seq long"
    sink(
        spark.createDataFrame(
            [(i, f"v{i}", "I", i) for i in range(10)], schema
        ),
        0,
    )
    sink(spark.createDataFrame([(3, "u3", "U", 100)], schema), 1)

    # three lost races: each allocated a manifest number, lost the
    # conditional flip, and walked away — the exact on-disk state a
    # CommitConflict leaves behind
    base = t.current_version()
    orphans = []
    for i in range(3):
        v = max(t.versions()) + 1
        path = os.path.join(root, "manifests", f"v{v}.json")
        assert t.backend.create_manifest_excl(
            path,
            _json.dumps(
                {
                    "version": v,
                    "base": base,
                    "files": [f"data/d-lost{i}/p.parquet"],
                    "op": "append",
                }
            ),
        )
        orphans.append(v)

    # a later commit skips the burned numbers, never clobbers them
    sink(spark.createDataFrame([(5, "u5", "U", 200)], schema), 2)
    live = {m["version"] for m in t.committed_chain()}
    assert set(orphans).isdisjoint(live)
    feed_before = sorted(
        (r["k"], r["v"], r["_op"], r["_version"])
        for r in version_changes(spark, t, "k", 0, t.current_version())
        .collect()
    )

    # young orphans survive the age gate (possible in-flight commits)
    res = vacuum(t, keep_versions=10, min_age_s=3600)
    assert res["dropped_orphan_manifests"] == 0
    assert set(orphans) <= set(t.versions())

    # past the gate they are collected; chain, time travel and a full
    # feed replay are untouched
    res = vacuum(t, keep_versions=10, min_age_s=0)
    assert res["dropped_orphan_manifests"] == 3
    assert set(t.versions()) == live
    assert t.read(spark).count() == 10
    assert t.read(spark, version=sorted(live)[0]).count() == 10
    feed_after = sorted(
        (r["k"], r["v"], r["_op"], r["_version"])
        for r in version_changes(spark, t, "k", 0, t.current_version())
        .collect()
    )
    assert feed_after == feed_before
