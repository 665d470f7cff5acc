"""Compile a fitted MLlib RandomForestClassificationModel to ANSI SQL.

The reference scores flows with ``model.transform`` and post-processes
``prediction`` into a DDoS/Normal label (spark_app/main.py:1087-1090).
Every other stage of that pipeline is oracle-checked by value; the RF
prediction itself was only ever rows/metrics-checked because MLlib
vectors have no DuckDB analogue. But a fitted forest of depth-6 trees is
a finite decision function: each tree is a nest of ``feature <=
threshold`` branches ending in leaf class-count distributions, so its
prediction is expressible as nested CASE expressions that DuckDB can
evaluate — closing the last value-unverified computation (round-6
verdict task #1).

Exact replication of Spark's prediction semantics
(``RandomForestClassificationModel`` in spark/ml/classification):

1. per tree: descend ``ContinuousSplit``s (left iff ``feature <=
   threshold``), land on a leaf, take its impurity class counts and
   normalize to a per-tree class distribution;
2. ``predictRaw``: sum those distributions across trees in tree order
   (votes accumulate left-to-right — IEEE addition order matters and is
   preserved by the generated ``t0 + t1 + ...`` chain, which both Spark
   and DuckDB evaluate left-associatively);
3. ``raw2probability``: divide each class vote by the vote total
   (``s0 + s1``, again in index order);
4. ``probability2prediction``: argmax, ties to the LOWEST class index
   (Vector.argmax keeps the first maximum) — hence ``p1 > p0 → 1.0
   ELSE 0.0``.

Leaf probabilities and thresholds are computed in Python (IEEE doubles,
identical to the JVM's arithmetic) and rendered with ``repr`` (shortest
round-tripping decimal) wrapped in ``CAST(... AS DOUBLE)`` so neither
engine parses them as DECIMAL (Spark types bare fractional literals as
DECIMAL; exact-decimal arithmetic would diverge from the double math).

Cross-engine determinism contract for callers: feed the forest
integer-exact feature columns only (counts, sums of integer lengths,
min/max). Float features computed independently by two engines can land
1 ulp apart and flip a ``<= threshold`` branch; integer-valued doubles
cannot, so the compiled forest is bit-for-bit reproducible anywhere.
"""

from __future__ import annotations


def _dlit(x: float) -> str:
    """Shortest exactly-round-tripping double literal, typed DOUBLE in
    both Spark SQL and DuckDB."""
    return f"CAST({x!r} AS DOUBLE)"


def _node_sql(jnode, feature_names: list[str], cls: int) -> str:
    """CASE expression for P(class=cls) at this (sub)tree — the leaf's
    normalized impurity class count, exactly what predictRaw uses."""
    name = jnode.getClass().getName()
    if name.endswith("InternalNode"):
        split = jnode.split()
        if not split.getClass().getName().endswith("ContinuousSplit"):
            raise ValueError(
                "only continuous splits are compilable; got "
                + split.getClass().getName()
            )
        feat = feature_names[split.featureIndex()]
        left = _node_sql(jnode.leftChild(), feature_names, cls)
        right = _node_sql(jnode.rightChild(), feature_names, cls)
        return (
            f"(CASE WHEN {feat} <= {_dlit(split.threshold())} "
            f"THEN {left} ELSE {right} END)"
        )
    stats = list(jnode.impurityStats().stats())
    total = 0.0
    for s in stats:  # left-to-right, mirroring the JVM's values.sum
        total += s
    return _dlit(stats[cls] / total)


def tree_prob_sql(tree_model, feature_names: list[str], cls: int) -> str:
    """One fitted DecisionTreeClassificationModel → P(class=cls) SQL."""
    return _node_sql(tree_model._java_obj.rootNode(), feature_names, cls)


def forest_vote_sqls(rf_model, feature_names: list[str]) -> tuple[str, str]:
    """(votes_class0, votes_class1) SQL texts for a fitted binary
    RandomForestClassificationModel — each the tree-order sum of
    per-tree normalized leaf distributions (= predictRaw)."""
    if rf_model.numClasses != 2:
        raise ValueError(f"binary forests only, got {rf_model.numClasses}")
    sums = []
    for cls in (0, 1):
        terms = [tree_prob_sql(t, feature_names, cls) for t in rf_model.trees]
        sums.append("(" + "\n + ".join(terms) + ")")
    return sums[0], sums[1]


def forest_scores_sql(
    rf_model, feature_names: list[str], source_sql: str, id_cols: list[str]
) -> str:
    """Full SELECT evaluating the fitted forest over ``source_sql``
    (a relation exposing ``feature_names`` + ``id_cols``), emitting
    ``prediction`` with transform()'s exact semantics."""
    s0, s1 = forest_vote_sqls(rf_model, feature_names)
    ids = ", ".join(id_cols)
    return f"""
SELECT {ids},
       CASE WHEN p1n > p0n THEN CAST(1.0 AS DOUBLE)
            ELSE CAST(0.0 AS DOUBLE) END AS prediction
FROM (
  SELECT {ids}, s0 / (s0 + s1) AS p0n, s1 / (s0 + s1) AS p1n
  FROM (SELECT {ids}, {s0} AS s0, {s1} AS s1 FROM ({source_sql}) flows) raw
) norm
"""


def forest_prediction_columns(rf_model, feature_names: list[str]):
    """Spark-side compiled twin: (votes0, votes1, prediction) Columns
    built from the SAME generated texts via F.expr — used by the unit
    tests to assert compiled == transform() on every row."""
    from pyspark.sql import functions as F

    s0, s1 = forest_vote_sqls(rf_model, feature_names)
    v0, v1 = F.expr(s0), F.expr(s1)
    p0n, p1n = v0 / (v0 + v1), v1 / (v0 + v1)
    pred = F.when(p1n > p0n, F.lit(1.0)).otherwise(F.lit(0.0))
    return v0, v1, pred
