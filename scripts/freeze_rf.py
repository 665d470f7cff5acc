"""Freeze the q122-contract RandomForest as a committed repo artifact.

q122 proves the REAL fitted forest's decision function against DuckDB,
but its oracle SQL is generated from a model trained at query time
(``sql_fn``) — and the driver ships only STATIC oracle strings, so the
real-model check never appears in CORRECTNESS_r{N}.json (r7 verdict
task #3). This script closes that gap by training ONCE, at a pinned
seed on the pinned sf0.001 fixture, and committing:

- ``anti_ddos_spark/artifacts/rf_frozen_model/``  — the fitted
  PipelineModel (VectorAssembler + RandomForestClassificationModel,
  MLlib native save format);
- ``anti_ddos_spark/artifacts/rf_frozen.sql``     — the forest compiled
  to nested-CASE SQL over the q24 flow replication
  (ml_compile.forest_scores_sql), the STATIC oracle text for
  q133_rf_frozen_scores;
- ``anti_ddos_spark/artifacts/rf_frozen_meta.json`` — features, label
  rule, training fixture, tree shape, and the sha256 of the SQL text.

tests/test_rf_frozen.py pins that recompiling the COMMITTED model
reproduces the committed SQL byte-exact, so the artifact pair can never
drift apart silently. Re-run this script only to intentionally re-freeze
(e.g. after changing RF_FEATURES), then commit both outputs together.

Usage: python scripts/freeze_rf.py [train_sf_dir]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TRAIN_SF = "/root/testdata/sf0.001"
ART = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "anti_ddos_spark",
    "artifacts",
)


def main(train_sf: str = TRAIN_SF) -> None:
    from anti_ddos_spark.ml import LABEL_BIN, ThresholdRuleModel, build_pipeline
    from anti_ddos_spark.ml_compile import forest_scores_sql
    from anti_ddos_spark.queries.base import t
    from anti_ddos_spark.queries.flow import FLOW_GAP_S, Q24_SQL, events_as_packets
    from anti_ddos_spark.queries.mlops import RF_FEATURES
    from anti_ddos_spark.session import get_spark
    from anti_ddos_spark.sessionize import flow_features

    spark = get_spark(app_name="freeze_rf", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    flows = flow_features(
        events_as_packets(t(spark, train_sf, "events")),
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
    rf = model.stages[-1]
    sql = forest_scores_sql(rf, RF_FEATURES, Q24_SQL, ["flow_id"])

    os.makedirs(ART, exist_ok=True)
    model.write().overwrite().save(os.path.join(ART, "rf_frozen_model"))
    with open(os.path.join(ART, "rf_frozen.sql"), "w") as f:
        f.write(sql)
    meta = {
        "features": RF_FEATURES,
        "label_rule": "ThresholdRuleModel(min_packets=3, min_bytes=1024)",
        "train_fixture": train_sf,
        "num_trees": rf.getNumTrees,
        "max_depth": rf.getMaxDepth(),
        "seed": rf.getSeed(),
        "sql_sha256": hashlib.sha256(sql.encode()).hexdigest(),
    }
    with open(os.path.join(ART, "rf_frozen_meta.json"), "w") as f:
        json.dump(meta, f, indent=1, sort_keys=True)
    print(json.dumps(meta))


if __name__ == "__main__":
    main(*sys.argv[1:2])
