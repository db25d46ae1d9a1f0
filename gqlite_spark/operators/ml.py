"""Decision-tree classification on graph/table features.

Reference parity: the reference scaffolds a decision tree on entropy /
information gain (src/operand/algorithms/DecisionTree.cpp — 10-LoC stub;
the gain math in Entropy.cpp is real and mirrored in operators/stats.py).
Per SURVEY §2.7 the Spark-native decision is to use Spark ML's distributed
``DecisionTreeClassifier`` rather than rebuild tree induction; this module
is that wiring, with `rank_features_by_gain` (stats.py) as the
reference-equivalent split-selection primitive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fit_decision_tree(df: DataFrame, feature_cols: list[str],
                      label_col: str, max_depth: int = 5, seed: int = 42):
    """Fit a distributed decision tree; returns (model, predictions_df).

    Features are assembled JVM-side (VectorAssembler); training is Spark
    ML's distributed impurity-histogram algorithm — the scale path the
    reference's single-node recursion could never take.
    """
    from pyspark.ml.classification import DecisionTreeClassifier
    from pyspark.ml.feature import VectorAssembler

    assembler = VectorAssembler(inputCols=feature_cols, outputCol="features")
    data = assembler.transform(df).withColumn(
        "label", F.col(label_col).cast("double"))
    tree = DecisionTreeClassifier(maxDepth=max_depth, seed=seed,
                                  impurity="entropy")
    model = tree.fit(data)
    preds = model.transform(data).select(
        *feature_cols, label_col,
        F.col("prediction").cast("long").alias("prediction"))
    return model, preds


def tree_accuracy(preds: DataFrame, label_col: str) -> float:
    total = preds.count()
    if total == 0:
        return 0.0
    hits = preds.filter(
        F.col("prediction") == F.col(label_col).cast("long")).count()
    return hits / total
