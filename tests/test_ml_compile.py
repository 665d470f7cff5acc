"""Fitted-forest → SQL compiler (ml_compile, round-6 verdict task #1).

Two layers of evidence:

1. compiled-vs-transform identity on Spark itself: every row's compiled
   prediction equals ``model.transform``'s, and a single tree's compiled
   leaf probability equals its ``probability`` vector entry — pinning
   the compiler against MLlib's own semantics (normalized leaf counts,
   tree-order vote sum, normalized argmax, ties → class 0);
2. the cross-engine value check lives in test_queries_oracle.py
   (q122_rf_compiled_scores): DuckDB independently recomputes the flow
   features AND evaluates the compiled forest, hash-matched against the
   real ``transform`` output. Here we run the same compare at sf0.001
   so the compiler is covered even when the full oracle sweep is
   filtered out.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

SF_SMALL = "/root/testdata/sf0.001"
FEATS = ["f1", "f2", "f3"]


@pytest.fixture(scope="module")
def toy_model(spark):
    random.seed(7)
    rows = [
        (i, random.randint(0, 20), random.randint(0, 2000), random.randint(0, 1500))
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "id int, f1 int, f2 int, f3 int").withColumn(
        "binary_label",
        F.when(
            (F.col("f1") >= 8) | (F.col("f2") + F.col("f3") >= 2200), 1.0
        ).otherwise(0.0),
    )
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import RandomForestClassifier
    from pyspark.ml.feature import VectorAssembler

    pipe = Pipeline(
        stages=[
            VectorAssembler(inputCols=FEATS, outputCol="features"),
            RandomForestClassifier(
                labelCol="binary_label", numTrees=7, maxDepth=3, seed=1
            ),
        ]
    )
    return pipe.fit(df), df


def test_compiled_forest_equals_transform_rowwise(toy_model):
    from anti_ddos_spark.ml_compile import forest_prediction_columns

    model, df = toy_model
    _v0, _v1, pred = forest_prediction_columns(model.stages[-1], FEATS)
    scored = model.transform(df).withColumn("pred_compiled", pred)
    assert scored.filter(F.col("prediction") != F.col("pred_compiled")).count() == 0


def test_single_tree_probability_is_exact(toy_model):
    from pyspark.ml.functions import vector_to_array

    from anti_ddos_spark.ml_compile import tree_prob_sql

    model, df = toy_model
    assembled = model.stages[0].transform(df)
    for tree in model.stages[-1].trees[:3]:
        chk = (
            tree.transform(assembled)
            .withColumn("p1_compiled", F.expr(tree_prob_sql(tree, FEATS, 1)))
            .withColumn("p1_mllib", vector_to_array("probability")[1])
        )
        # bitwise equality, not approx: the compiler's whole point
        assert chk.filter(F.col("p1_mllib") != F.col("p1_compiled")).count() == 0


def test_vote_sum_definition(toy_model):
    """votes0 + votes1 per row must equal numTrees up to the normalized
    per-tree distributions summing to 1 — a structural sanity check that
    the two vote expressions cover the same leaves."""
    from anti_ddos_spark.ml_compile import forest_prediction_columns

    model, df = toy_model
    v0, v1, _ = forest_prediction_columns(model.stages[-1], FEATS)
    mx = (
        df.select((F.abs(v0 + v1 - F.lit(7.0))).alias("d"))
        .agg(F.max("d"))
        .collect()[0][0]
    )
    assert mx < 1e-9


def test_q122_rf_oracle_at_sf0001(spark):
    """End-to-end at the smallest sf: real RF transform vs the fitted
    model compiled to SQL, evaluated by DuckDB over its own q24 flow
    replication."""
    from oracle_utils import compare, duck_for

    from anti_ddos_spark.queries import full_registry

    q = full_registry()["q122_rf_compiled_scores"]
    df = q.fn(spark, SF_SMALL)
    con = duck_for(SF_SMALL)
    try:
        compare(df, con, q.sql_fn(spark, SF_SMALL), "q122@sf0.001")
    finally:
        con.close()
    # both classes must appear or the hash pins a constant function
    assert df.select("prediction").distinct().count() == 2
