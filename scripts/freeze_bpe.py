"""Freeze a learned BPE merge list as a committed repo artifact.

q124 proves learned-BPE tokenization by value, but its oracle SQL is
generated from merges learned at query time (``sql_fn``) — so, like
q122 before round 8, it can never be a driver row (the driver ships
static oracle strings). The production analogue is obvious: you COMMIT
your tokenizer vocabulary. This script learns the merge list once from
the sf0.01 documents fixture and writes:

- ``anti_ddos_spark/artifacts/bpe_merges.json`` — the merges + meta
  (corpus, trainer params, sha256 of the canonical merge text).

q136_bpe_frozen_vocab then tokenizes with the COMMITTED vocabulary and
its oracle is the static SQL generated from the artifact at import
time. tests/test_bpe.py pins that re-learning from the fixture
reproduces the artifact exactly (Spark histogram + the exact local
trainer), so vocabulary and oracle cannot drift from the corpus
silently.

Histogram here is built with DuckDB (same WORD_SPLIT_RE contract the
cross-engine oracles already pin) so the freeze itself needs no JVM;
the regen pin test rebuilds it with Spark's word_histogram and must
agree.

Usage: python scripts/freeze_bpe.py [sf_dir] [num_merges]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.01"
NUM_MERGES = 32
ART = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "anti_ddos_spark",
    "artifacts",
)


def duck_histogram(sf_dir: str) -> list:
    import duckdb

    from anti_ddos_spark.operators.bpe import WORD_SPLIT_RE

    rows = duckdb.sql(
        f"""
        SELECT w, count(*)::BIGINT AS cnt FROM (
          SELECT unnest(list_filter(
                   regexp_split_to_array(lower(text), '{WORD_SPLIT_RE}'),
                   x -> len(x) > 0)) AS w
          FROM read_parquet('{sf_dir}/documents.parquet')) GROUP BY w
        """
    ).fetchall()
    return [(w, int(c)) for w, c in rows]


def main(sf_dir: str = SF_DIR, num_merges: int = NUM_MERGES) -> None:
    from anti_ddos_spark.operators.bpe import bpe_learn_local

    merges = bpe_learn_local(duck_histogram(sf_dir), int(num_merges))
    canon = "\n".join(f"{a} {b}" for a, b in merges)
    meta = {
        "merges": [list(m) for m in merges],
        "num_merges_requested": int(num_merges),
        "learned": len(merges),
        "train_fixture": sf_dir,
        "merges_sha256": hashlib.sha256(canon.encode()).hexdigest(),
    }
    os.makedirs(ART, exist_ok=True)
    with open(os.path.join(ART, "bpe_merges.json"), "w") as f:
        json.dump(meta, f, indent=1, sort_keys=True)
    print(json.dumps(meta))


if __name__ == "__main__":
    main(*sys.argv[1:3])
