"""Frozen RF artifact (r7 verdict task #3): the committed model and its
committed compiled SQL can never drift apart, and the driver row's
Spark side (model.transform) equals the compiled decision function."""

from __future__ import annotations

import hashlib
import json
import os

from pyspark.sql import functions as F

from anti_ddos_spark.queries.mlops import (
    ARTIFACT_DIR,
    RF_FEATURES,
    _frozen_model,
    q133_rf_frozen_scores,
)

SF = "/root/testdata/sf0.001"


def test_recompiling_committed_model_reproduces_frozen_sql(spark):
    """Byte-exact: forest_scores_sql over the COMMITTED model must equal
    the committed rf_frozen.sql — the pin that makes the static oracle
    trustworthy (a model swap without an SQL re-freeze fails here)."""
    from anti_ddos_spark.ml_compile import forest_scores_sql
    from anti_ddos_spark.queries.flow import Q24_SQL

    model = _frozen_model(spark)
    regenerated = forest_scores_sql(
        model.stages[-1], RF_FEATURES, Q24_SQL, ["flow_id"]
    )
    with open(os.path.join(ARTIFACT_DIR, "rf_frozen.sql")) as f:
        frozen = f.read()
    assert regenerated == frozen

    with open(os.path.join(ARTIFACT_DIR, "rf_frozen_meta.json")) as f:
        meta = json.load(f)
    assert meta["sql_sha256"] == hashlib.sha256(frozen.encode()).hexdigest()
    assert meta["features"] == RF_FEATURES


def test_frozen_transform_equals_compiled_columns(spark):
    """Row-level parity on a fixture the model was NOT trained on is
    covered by the q133 oracle at sf0.01; here the Spark-side twin:
    transform() == the compiled expression evaluated by Spark itself,
    on every flow of the training fixture."""
    from anti_ddos_spark.ml_compile import forest_prediction_columns
    from anti_ddos_spark.queries.flow import FLOW_GAP_S, events_as_packets
    from anti_ddos_spark.queries.base import t
    from anti_ddos_spark.sessionize import flow_features

    flows = flow_features(
        events_as_packets(t(spark, SF, "events")),
        gap_s=FLOW_GAP_S,
        mode="faithful",
    ).select("flow_id", *RF_FEATURES)
    model = _frozen_model(spark)
    _, _, pred = forest_prediction_columns(model.stages[-1], RF_FEATURES)
    both = (
        model.transform(flows)
        .withColumn("compiled", pred)
        .select("flow_id", "prediction", "compiled")
    )
    mismatches = both.filter(F.col("prediction") != F.col("compiled")).count()
    n = both.count()
    assert n > 0 and mismatches == 0
    # the frozen model is a real classifier, not a constant function
    classes = q133_rf_frozen_scores(spark, SF).select("prediction").distinct()
    assert classes.count() == 2
