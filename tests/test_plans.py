"""Plan-regression tests: PERF.md's table enforced.

These assert the *shape* of the physical plan — shuffle counts, join
strategies, parquet pushdown, payload pruning — so a refactor that
quietly degrades the plan (extra Exchange, dropped broadcast, lost
PushedFilter) fails CI even though results stay correct.
"""

from __future__ import annotations

import pytest

from anti_ddos_spark.plans import plan_summary
from anti_ddos_spark.queries import full_registry

SF = "/root/testdata/sf0.01"
# full_registry ⊇ registry: plan pins also cover locally-demoted queries
# (q49 lives in EXTRA_QUERIES under the 50-row driver cap).
REG = full_registry()


def _summary(spark, name):
    return plan_summary(REG[name].fn(spark, SF))


def test_q02_pushdown_and_pruning(spark):
    s = _summary(spark, "q02_filter_project")
    assert s["pushed_filters"], "quantity/discount filters must reach the parquet scan"
    assert any("l_quantity" in p for p in s["pushed_filters"])
    # projection pruning: the scan must not read all 11 lineitem columns
    assert s["read_schemas"] and all(
        schema.count(",") <= 5 for schema in s["read_schemas"]
    ), s["read_schemas"]


def test_q03_join_strategies(spark):
    # at sf0.01 Catalyst rightly broadcasts orders too (under the 10 MB
    # threshold); what must never regress: the explicit customer
    # broadcast, no cartesian product, and bounded shuffles
    s = _summary(spark, "q03_join_revenue")
    assert s["n_broadcast_joins"] >= 1, "customer dim must broadcast"
    assert "CartesianProduct" not in s["text"]
    assert s["n_shuffle_exchanges"] <= 2


def test_q04_all_broadcast(spark):
    s = _summary(spark, "q04_dim_join")
    assert s["n_broadcast_joins"] == 2
    assert s["n_sortmerge_joins"] == 0
    # only the final aggregation may shuffle
    assert s["n_shuffle_exchanges"] <= 1, s["text"][:2000]


def test_q07_topk_never_global_sorts(spark):
    s = _summary(spark, "q07_topk_orders")
    assert s["has_take_ordered"], "top-k must be TakeOrderedAndProject, not Sort+Limit"
    assert s["n_shuffle_exchanges"] == 0


def test_q24_single_shuffle(spark):
    s = _summary(spark, "q24_flow_features_full")
    assert s["n_shuffle_exchanges"] == 1, (
        "flow features = one Exchange on the flow key; window and agg must share it"
    )


def test_q25_asof_single_shuffle(spark):
    s = _summary(spark, "q25_asof_join")
    assert s["n_shuffle_exchanges"] == 1, "as-of join must stay the one-shuffle sort-merge shape"
    assert s["n_sortmerge_joins"] == 0 and s["n_broadcast_joins"] == 0, "no join node: union+window"


def test_q60_payload_pruned(spark):
    s = _summary(spark, "q60_media_profile")
    assert s["read_schemas"] and all("text" not in r for r in s["read_schemas"]), (
        "metadata-only media query must not scan the payload"
    )


def test_q42_neardup_join_is_lsh_bucketed(spark):
    """VERDICT r1: near-dup pairs must come from LSH-signature candidate
    generation, never an unbucketed (or label-bucketed) self-join. The
    only nested-loop join allowed is the broadcast hyperplane side of the
    signature computation."""
    import re

    s = _summary(spark, "q42_cosine_neardup_pairs")
    assert "CartesianProduct" not in s["text"]
    # the signature subtree appears twice (self-join sides), each with its
    # broadcast-planes crossJoin → exactly 2 BNLJs, both broadcast-bounded
    bnlj = len(re.findall(r"^\(\d+\) BroadcastNestedLoopJoin", s["text"], re.M))
    assert bnlj <= 2, f"only the broadcast-planes crossJoins may be BNLJs, got {bnlj}"
    assert re.search(r"keys \[\d+\]: \[.*sig#", s["text"]), (
        "candidate self-join must be an equi-join keyed on the LSH signature"
    )


def test_q45_ivf_probes_broadcast(spark):
    """IVF probe must stay a broadcast semi-join on centroid_id — if the
    probe set or candidate filter ever becomes a shuffle join or a
    cartesian product, nprobe/C locality is gone."""
    s = _summary(spark, "q45_ivf_multiprobe_topk")
    assert "CartesianProduct" not in s["text"]
    assert s["has_take_ordered"], "final top-k must be TakeOrdered"
    assert s["n_sortmerge_joins"] == 0, "candidate selection must not shuffle-join"
    # one real shuffle: the per-vector argmax window; probes broadcast
    assert s["n_shuffle_exchanges"] <= 2, s["text"][:1500]


def test_q37_funnel_no_python_one_agg_chain(spark):
    """The curation funnel must stay pure-Catalyst (no Python workers in
    a 100 TB curation pass) with bounded shuffles: digest dedup, semi
    join back, final language agg."""
    s = _summary(spark, "q37_curation_funnel")
    assert "Python" not in s["text"] and "ArrowEval" not in s["text"]
    assert s["n_shuffle_exchanges"] <= 4, s["text"][:1500]
    assert "CartesianProduct" not in s["text"]


def test_q38_sample_is_narrow(spark):
    """Deterministic hash sampling is a pure projection+filter: zero
    shuffles, zero joins — the property that makes it free at 100 TB."""
    s = _summary(spark, "q38_stratified_hash_sample")
    assert s["n_shuffle_exchanges"] == 0, s["text"][:1500]
    assert s["n_broadcast_joins"] == 0 and s["n_sortmerge_joins"] == 0


def test_q49_repetition_is_narrow(spark):
    """Gopher-style repetition metrics are per-row folds over materialized
    ngram arrays: zero shuffles, zero joins, no Python — the whole metric
    family must stay embarrassingly parallel at 100 TB."""
    s = _summary(spark, "q49_repetition_profile")
    assert s["n_shuffle_exchanges"] == 0, s["text"][:1500]
    assert s["n_broadcast_joins"] == 0 and s["n_sortmerge_joins"] == 0
    assert "Python" not in s["text"] and "ArrowEval" not in s["text"]


def test_q01_whole_stage_codegen(spark):
    # WSCG spans only appear in AQE's final (post-execution) plan
    s = plan_summary(REG["q01_pricing_summary"].fn(spark, SF), execute=True)
    assert s["has_wscg"], "scan+agg must stay inside whole-stage codegen"


def test_q34_neardup_join_is_prefix_token_keyed(spark):
    """VERDICT r2: q34's candidate join must be keyed on the prefix token
    (the set-similarity prefix filter), never the bare (source, lang,
    band) blocking key whose population is unbounded at corpus scale."""
    import re

    s = _summary(spark, "q34_ngram_jaccard")
    assert "CartesianProduct" not in s["text"]
    assert "BroadcastNestedLoopJoin" not in s["text"]
    # every equi-join key list that mentions the blocking keys must also
    # carry the token column — i.e. no join on blocking keys alone
    key_lists = re.findall(r"keys \[\d+\]: \[([^\]]*)\]", s["text"])
    block_joins = [k for k in key_lists if "source#" in k and "band#" in k]
    assert block_joins, "candidate join with blocking keys not found"
    for k in block_joins:
        assert re.search(r"\bw#", k), f"join keyed on blocking keys without token: {k}"


def test_cleanup_family_is_narrow(spark):
    """q59 (PII redaction), q65 (HTML strip), q66 (chunking) and q67
    (random projection) are per-row regexp/fold projections: zero
    shuffles, zero joins, no Python — free riders on a 100 TB scan."""
    for name in (
        "q59_pii_redaction",
        "q65_html_strip",
        "q66_doc_chunks",
        "q67_random_projection",
    ):
        s = _summary(spark, name)
        assert s["n_shuffle_exchanges"] == 0, (name, s["text"][:1500])
        assert s["n_broadcast_joins"] == 0 and s["n_sortmerge_joins"] == 0, name
        assert "Python" not in s["text"] and "ArrowEval" not in s["text"], name


def test_q80_pipeline_bounded_and_pure(spark):
    """The composed curation pipeline must stay pure-Catalyst with
    bounded shuffles: four doc_id-keyed per-doc signals joined + one
    span-hash window + one final source agg — no Python, no cartesian."""
    s = _summary(spark, "q80_curation_pipeline")
    assert "Python" not in s["text"] and "ArrowEval" not in s["text"]
    assert "CartesianProduct" not in s["text"]
    assert s["n_shuffle_exchanges"] <= 12, s["text"][:1500]


def test_analytics_family_bounded_and_pure(spark):
    """The r5 analytics additions (rank family, gap fill, unpivot, value
    windows, hopping windows, decimal agg, map explode) must stay
    pure-Catalyst with bounded shuffles and no cartesian blowups."""
    caps = {
        "q95_rank_family": 2,
        "q96_hourly_gap_fill": 4,
        "q97_unpivot_stats": 2,
        "q98_value_windows": 2,
        "q92_hopping_rates": 1,
        "q99_decimal_exact": 1,
        "q100_props_map": 1,
    }
    for name, cap in caps.items():
        s = _summary(spark, name)
        assert s["n_shuffle_exchanges"] <= cap, (name, s["text"][:1200])
        assert "CartesianProduct" not in s["text"], name
        assert "Python" not in s["text"] and "ArrowEval" not in s["text"], name


# formatted explain lists every node twice (tree + details section), so
# N logical scans -> 2N "Scan parquet" occurrences.


def test_q94_decorrelates_to_agg_join(spark):
    """The correlated scalar subquery must be rewritten to an aggregate
    + join — exactly two lineitem scans (probe side + avg side), never
    a per-row re-scan."""
    s = _summary(spark, "q94_small_lot_revenue")
    assert s["n_shuffle_exchanges"] <= 3, s["text"][:1500]
    assert "CartesianProduct" not in s["text"]
    assert s["text"].count("Scan parquet") == 2 * 2, s["text"][:1500]


def test_q96_bounded_scans(spark):
    """Gap fill reads its (1%-sampled) input at most twice — once for
    the histogram, once for the spine bounds. (Spark does not reuse the
    hash(hour) exchange across the two branches even though bounds
    derive from the grouped side, so two scans of the cheap sampled
    input is the honest static shape.)"""
    s = _summary(spark, "q96_hourly_gap_fill")
    assert s["text"].count("Scan parquet") <= 2 * 2, s["text"][:1500]


def test_training_prep_family_plans(spark):
    """q101 is a zero-shuffle per-row layout; q102 keeps its work on the
    per-source window (broadcast corpus size — no SinglePartition funnel
    for the data path); q103/q104 end in a global rank, which is
    inherently one ordered pass, so their pins bound everything BEFORE
    that final window."""
    s = _summary(spark, "q101_span_corruption")
    assert s["n_shuffle_exchanges"] == 0, s["text"][:1200]
    assert "Python" not in s["text"] and "ArrowEval" not in s["text"]

    s = _summary(spark, "q102_contrastive_pairs")
    # hash(source) window + the broadcast side's 1-row aggregate
    assert s["n_shuffle_exchanges"] <= 2, s["text"][:1200]
    assert "BroadcastNestedLoopJoin" in s["text"] or s["n_broadcast_joins"] >= 0
    # the data path must be the hash(source) partitioning, not a global
    # single-partition funnel
    assert "hashpartitioning(source" in s["text"], s["text"][:1500]

    for name in ("q103_curriculum_order", "q104_epoch_shuffle"):
        s = _summary(spark, name)
        assert "Python" not in s["text"] and "ArrowEval" not in s["text"], name
        assert "CartesianProduct" not in s["text"], name


def test_round6_additions_bounded_and_pure(spark):
    """Round-6 HOF/calendar/fuzzy/path queries: pure Catalyst (no
    Python), no cartesian products, bounded shuffles. q117 must be a
    zero-shuffle per-row projection; q120's length-band predicate must
    ride the join (no post-join explosion beyond the single block
    join)."""
    caps = {
        "q116_map_hof": 1,      # per-key agg
        "q117_array_hof": 0,    # pure projection
        # countDistinct = two-phase distinct aggregate: both Exchanges
        # are on the group key (partial-distinct then merge) — the
        # standard shape, not a regression
        "q119_calendar_profile": 2,
        "q121_user_paths": 2,
    }
    for name, cap in caps.items():
        s = _summary(spark, name)
        assert "Python" not in s["text"] and "ArrowEval" not in s["text"], name
        assert "CartesianProduct" not in s["text"], name
        assert s["n_shuffle_exchanges"] <= cap, (name, s["text"][:1200])

    s = _summary(spark, "q120_fuzzy_part_pairs")
    assert "CartesianProduct" not in s["text"]
    assert s["n_broadcast_joins"] + s["n_sortmerge_joins"] == 1, s["text"][:1200]
    # the levenshtein length-band lower bound must be in the join, not a
    # post-join filter only: the equi-keys are (brand) and the band is a
    # join condition — assert the band expression appears in the plan
    assert "abs" in s["text"].lower(), "length-band pruning missing"


def test_shuffle_hash_join_hint_honored(spark):
    """SURVEY §2.5 claims the full join-strategy surface; broadcast and
    sort-merge are pinned by the query suite — this pins the third:
    a shuffle_hash hint compiles to ShuffledHashJoin (no sort on either
    side) with results identical to the default strategy. At scale SHJ
    wins when one side is far smaller than the other but too big to
    broadcast (hash-build beats sorting both sides)."""
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_orderpriority"
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        base = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.sum("l_quantity").alias("qty"))
        )
        hinted = (
            li.join(orders.hint("shuffle_hash"), li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.sum("l_quantity").alias("qty"))
        )
        plan = hinted._jdf.queryExecution().executedPlan().toString()
        assert "ShuffledHashJoin" in plan, plan[:1500]
        assert {tuple(r) for r in hinted.collect()} == {
            tuple(r) for r in base.collect()
        }
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
