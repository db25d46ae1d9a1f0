"""Information-theoretic operators: entropy and information gain.

Reference parity: gql::entropy / GGain (src/base/math/Entropy.cpp:11-76,
FULL, tested by test/infomation.cpp) — base-2 entropy, gain = I(target) −
remainder(feature).  Here computed distributed: probabilities come from
groupBy counts (one shuffle), never a driver-side histogram, so the same
code profiles a 100 TB feature column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def entropy(df: DataFrame, col: str) -> float:
    """Shannon entropy (base 2) of a column's empirical distribution."""
    counts = df.groupBy(col).agg(F.count("*").alias("c"))
    total = df.count()
    if total == 0:
        return 0.0
    row = (counts.select(
        F.sum(-(F.col("c") / total) * F.log2(F.col("c") / total)).alias("h"))
        .collect()[0])
    return float(row["h"] or 0.0)


def conditional_entropy(df: DataFrame, feature: str, target: str) -> float:
    """H(target | feature) = Σ_v p(v) · H(target | feature=v) — the
    'remainder' term of the reference's gain computation."""
    total = df.count()
    if total == 0:
        return 0.0
    joint = (df.groupBy(feature, target).agg(F.count("*").alias("c"))
             .withColumn("fc", F.sum("c").over(Window.partitionBy(feature))))
    row = (joint.select(F.sum(
        (F.col("c") / total) * -F.log2(F.col("c") / F.col("fc"))).alias("h"))
        .collect()[0])
    return float(row["h"] or 0.0)


def information_gain(df: DataFrame, feature: str, target: str) -> float:
    """gain(feature) = H(target) − H(target | feature)."""
    return entropy(df, target) - conditional_entropy(df, feature, target)


def rank_features_by_gain(df: DataFrame, features: list[str],
                          target: str) -> list[tuple[str, float]]:
    """Features sorted by information gain, descending — the decision-tree
    split-selection primitive (GGain ordering parity)."""
    gains = [(f, information_gain(df, f, target)) for f in features]
    return sorted(gains, key=lambda kv: (-kv[1], kv[0]))
