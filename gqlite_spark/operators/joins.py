"""Skew-resilient join helpers.

AQE's skew-join splitting (on in ``session.py``) handles most skew by
subdividing oversized partitions AFTER the shuffle files exist.  Salting
attacks the pathological case AQE can't fix: a single join key so hot that
even one task per split is dominated by one reducer — e.g. the null/default
key holding 10% of a 100 TB fact table, joined to a dimension too large to
broadcast.  Salting splits each hot key across ``salts`` reducers at the
cost of replicating the small side ``salts``×.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(big: DataFrame, small: DataFrame, key: str,
                salts: int = 16, how: str = "inner") -> DataFrame:
    """Join ``big`` (skewed on ``key``) to ``small`` by salting: each big
    row gets a pseudo-random salt in [0, salts); the small side is
    replicated once per salt value; the join runs on (key, salt), spreading
    every hot key over ``salts`` reducers.

    Result equality with the plain join holds for any salt assignment, so
    the salt derives from a row-id hash (deterministic within a run, and
    irrelevant to the output).  ``how`` supports inner/left variants (the
    small side is the replicated one, so right/full would multiply
    unmatched small rows — rejected).
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(f"salted_join supports inner/left joins, got {how}")
    b = big.withColumn(
        "_salt",
        F.pmod(F.xxhash64(F.monotonically_increasing_id()),
               F.lit(salts)).cast("int"))
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1))))
    return b.join(s, [key, "_salt"], how).drop("_salt")
