"""Histogram sketch: quantiles within a bin width, merge == whole,
per-group, clamping, and degenerate inputs."""

import pytest
from pyspark.sql import functions as F

from gqlite_spark.operators.stats import (
    hist_merge, hist_quantiles, hist_sketch)

LO, HI, BINS = 0.0, 1000.0, 200
WIDTH = (HI - LO) / BINS


def _uniform(spark, n, col="x"):
    # id scaled into [0, 1000): quantile q sits at ~1000q
    return spark.range(n).select((F.col("id") * (1000.0 / n)).alias(col))


def test_quantiles_within_bin_width(spark):
    df = _uniform(spark, 100_000)
    sk = hist_sketch(df, "x", LO, HI, BINS)
    got = {r["q"]: r["value"] for r in
           hist_quantiles(sk, [0.1, 0.5, 0.99], LO, HI, BINS).collect()}
    for q, v in got.items():
        assert abs(v - 1000.0 * q) <= WIDTH + 1e-9, (q, v)


def test_merge_equals_whole(spark):
    a = _uniform(spark, 40_000)
    b = spark.range(40_000).select(
        ((F.col("id") % 500) * 2.0).alias("x"))   # different shape
    merged = hist_merge(
        [hist_sketch(a, "x", LO, HI, BINS), hist_sketch(b, "x", LO, HI, BINS)])
    whole = hist_sketch(a.unionByName(b), "x", LO, HI, BINS)
    assert (sorted((r["bin"], r["n"]) for r in merged.collect())
            == sorted((r["bin"], r["n"]) for r in whole.collect()))
    qm = {r["q"]: r["value"] for r in
          hist_quantiles(merged, [0.5], LO, HI, BINS).collect()}
    qw = {r["q"]: r["value"] for r in
          hist_quantiles(whole, [0.5], LO, HI, BINS).collect()}
    assert qm == qw


def test_per_group_quantiles(spark):
    df = (_uniform(spark, 50_000)
          .withColumn("g", (F.col("x") < 500).cast("int")))
    sk = hist_sketch(df, "x", LO, HI, BINS, by=["g"])
    got = {(r["g"], r["q"]): r["value"] for r in
           hist_quantiles(sk, [0.5], LO, HI, BINS, by=["g"]).collect()}
    # group 1 = [0, 500): median ~250; group 0 = [500, 1000): ~750
    assert abs(got[(1, 0.5)] - 250.0) <= WIDTH + 1e-9
    assert abs(got[(0, 0.5)] - 750.0) <= WIDTH + 1e-9


def test_out_of_range_clamps_and_totals_preserved(spark):
    df = spark.range(1_000).select((F.col("id") * 10.0 - 2000.0).alias("x"))
    sk = hist_sketch(df, "x", LO, HI, BINS)
    assert sk.agg(F.sum("n")).collect()[0][0] == 1_000
    bins = {r["bin"] for r in sk.collect()}
    assert min(bins) == 1 and max(bins) == BINS


def test_degenerate_inputs(spark):
    with pytest.raises(ValueError, match="hi > lo"):
        hist_sketch(_uniform(spark, 10), "x", 5.0, 5.0, 10)
    empty = _uniform(spark, 1).filter("x > 99999")
    sk = hist_sketch(empty, "x", LO, HI, BINS)
    assert hist_quantiles(sk, [0.5], LO, HI, BINS).count() == 0


def test_nulls_are_not_values(spark):
    """NULL must not clamp into the top bin (least/greatest skip
    nulls) — it is dropped, and totals count only real values."""
    df = spark.range(0, 100).select(
        F.when(F.col("id") < 40, F.col("id").cast("double") * 10)
        .alias("x"))                                   # 60 nulls
    sk = hist_sketch(df, "x", LO, HI, BINS)
    assert sk.agg(F.sum("n")).collect()[0][0] == 40
    assert max(r["bin"] for r in sk.collect()) < BINS  # nothing at hi
