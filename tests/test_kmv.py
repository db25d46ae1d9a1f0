"""KMV distinct sketch: exact-below-k, accuracy, merge = union, and
duplicate-invariance.  The sketch is deterministic (md5 60-bit hashes),
so accuracy assertions pin fixed bands, not statistical tolerances."""

import pytest
from pyspark.sql import functions as F

from gqlite_spark.operators.stats import (
    KMV_HASH_SPACE, kmv_estimate, kmv_merge, kmv_sketch)


def _ints(spark, lo, hi, col="v"):
    return spark.range(lo, hi).select(F.col("id").alias(col))


def test_exact_below_k(spark):
    df = _ints(spark, 0, 100)
    sk = kmv_sketch(df, "v", k=256)
    est = kmv_estimate(sk, k=256).collect()[0]["n_distinct_est"]
    assert est == 100


def test_estimate_accuracy_above_k(spark):
    n = 20_000
    df = _ints(spark, 0, n)
    sk = kmv_sketch(df, "v", k=256)
    assert sk.count() == 256
    est = kmv_estimate(sk, k=256).collect()[0]["n_distinct_est"]
    # deterministic hash -> deterministic estimate; ~6% expected error
    # at k=256, assert a 15% band
    assert abs(est - n) / n < 0.15


def test_duplicates_do_not_change_sketch(spark):
    df = _ints(spark, 0, 5_000)
    doubled = df.unionAll(df).unionAll(df)
    a = sorted(r["h"] for r in kmv_sketch(df, "v", k=64).collect())
    b = sorted(r["h"] for r in kmv_sketch(doubled, "v", k=64).collect())
    assert a == b


def test_merge_equals_sketch_of_union(spark):
    a = _ints(spark, 0, 8_000)
    b = _ints(spark, 4_000, 12_000)  # overlapping batches
    merged = kmv_merge(
        [kmv_sketch(a, "v", k=128), kmv_sketch(b, "v", k=128)], k=128)
    direct = kmv_sketch(a.unionAll(b), "v", k=128)
    assert (sorted(r["h"] for r in merged.collect())
            == sorted(r["h"] for r in direct.collect()))
    est = kmv_estimate(merged, k=128).collect()[0]["n_distinct_est"]
    assert abs(est - 12_000) / 12_000 < 0.25  # k=128 -> wider band


def test_per_group_matches_global(spark):
    df = (_ints(spark, 0, 3_000)
          .withColumn("g", (F.col("v") % 2).cast("int")))
    per = {r["g"]: r["n_distinct_est"]
           for r in kmv_estimate(
               kmv_sketch(df, "v", k=256, by=["g"]), k=256,
               by=["g"]).collect()}
    for g in (0, 1):
        solo = df.filter(F.col("g") == g)
        want = kmv_estimate(
            kmv_sketch(solo, "v", k=256), k=256).collect()[0][0]
        assert per[g] == want  # same estimator path as the solo sketch
        assert abs(per[g] - 1_500) / 1_500 < 0.15


def test_sketch_rows_are_bounded_and_sorted_domain(spark):
    sk = kmv_sketch(_ints(spark, 0, 50_000), "v", k=32)
    rows = [r["h"] for r in sk.collect()]
    assert len(rows) == 32
    assert all(0 <= h < KMV_HASH_SPACE for h in rows)


def test_global_plan_is_take_ordered(spark):
    """The global min-k must be a TakeOrderedAndProject (per-partition
    top-k, k-row driver merge), never a full global sort."""
    sk = kmv_sketch(_ints(spark, 0, 10_000), "v", k=16)
    plan = sk._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


@pytest.mark.parametrize("n,k", [(1, 8), (0, 8)])
def test_degenerate_inputs(spark, n, k):
    df = _ints(spark, 0, n)
    est = kmv_estimate(kmv_sketch(df, "v", k=k), k=k).collect()
    assert est[0]["n_distinct_est"] == n


def test_prefilter_fallback_below_k(spark):
    """30 distinct values with k=64: the prefiltered pass returns short
    and the fallback must still produce the exact count."""
    df = _ints(spark, 0, 30)
    est = kmv_estimate(kmv_sketch(df, "v", k=64), k=64).collect()[0][0]
    assert est == 30


def test_prefilter_matches_unfiltered(spark):
    """The prefilter is a pure optimization: same min-k rows."""
    df = _ints(spark, 0, 30_000)
    a = sorted(r["h"] for r in
               kmv_sketch(df, "v", k=128, prefilter=True).collect())
    b = sorted(r["h"] for r in
               kmv_sketch(df, "v", k=128, prefilter=False).collect())
    assert a == b and len(a) == 128


def test_xx_hash_estimates(spark):
    """The xxhash64 fast path is a valid estimator too (different hash
    assignment, same math)."""
    n = 20_000
    est = kmv_estimate(kmv_sketch(_ints(spark, 0, n), "v", k=256,
                                  hash="xx"), k=256).collect()[0][0]
    assert abs(est - n) / n < 0.15
    import pytest as _pt
    with _pt.raises(ValueError, match="md5|xx"):
        kmv_sketch(_ints(spark, 0, 10), "v", hash="bogus").collect()


def test_per_group_prefilter_matches_unfiltered(spark):
    """Per-group prefilter + straggler fallback == plain per-group
    min-k, across a big group (prefilter serves it), a small group and
    a heavily-duplicated group (both fall back)."""
    big = _ints(spark, 0, 40_000).withColumn("g", F.lit("big"))
    small = _ints(spark, 0, 50).withColumn("g", F.lit("small"))
    dup = (_ints(spark, 0, 40_000)
           .select((F.col("v") % 100).alias("v"))
           .withColumn("g", F.lit("dup")))
    df = big.unionByName(small).unionByName(dup)
    a = {(r["g"], r["h"]) for r in
         kmv_sketch(df, "v", k=96, by=["g"], prefilter=True).collect()}
    b = {(r["g"], r["h"]) for r in
         kmv_sketch(df, "v", k=96, by=["g"], prefilter=False).collect()}
    assert a == b
    est = {r["g"]: r["n_distinct_est"] for r in kmv_estimate(
        kmv_sketch(df, "v", k=96, by=["g"]), k=96, by=["g"]).collect()}
    assert est["small"] == 50           # 50 < k: exact
    assert abs(est["dup"] - 100) <= 10  # 100 > k=96: estimated
    assert abs(est["big"] - 40_000) / 40_000 < 0.25


def test_straggler_guard_reverts_to_plain_build(spark, monkeypatch):
    """Above the straggler-broadcast bound the per-group build reverts
    to the plain path — results must be identical either way."""
    from gqlite_spark.operators import stats
    df = (_ints(spark, 0, 2_000)
          .withColumn("g", (F.col("v") % 7).cast("string")))
    monkeypatch.setattr(stats, "KMV_STRAGGLER_BROADCAST_MAX", 0)
    a = {(r["g"], r["h"]) for r in
         kmv_sketch(df, "v", k=64, by=["g"], prefilter=True).collect()}
    b = {(r["g"], r["h"]) for r in
         kmv_sketch(df, "v", k=64, by=["g"], prefilter=False).collect()}
    assert a == b


def test_nulls_are_not_values(spark):
    """NULL must not enter the sketch (it hashes to NULL, which would
    sort first into the min-k) — countDistinct semantics."""
    df = spark.range(0, 100).select(
        F.when(F.col("id") < 40, F.col("id")).alias("v"))  # 60 nulls
    sk = kmv_sketch(df, "v", k=256)
    assert all(r["h"] is not None for r in sk.collect())
    est = kmv_estimate(sk, k=256).collect()[0][0]
    assert est == 40


def test_null_group_key_is_a_real_group(spark):
    """A NULL group key must survive the prefilter straggler repair
    (null-unsafe joins would silently drop or truncate its sketch)."""
    df = (_ints(spark, 0, 30_000)
          .withColumn("g", F.when(F.col("v") % 3 != 0, F.col("v") % 2)))
    # g in {0, 1, NULL}; the NULL group holds every v % 3 == 0
    a = {(r["g"], r["h"]) for r in
         kmv_sketch(df, "v", k=64, by=["g"], prefilter=True).collect()}
    b = {(r["g"], r["h"]) for r in
         kmv_sketch(df, "v", k=64, by=["g"], prefilter=False).collect()}
    assert a == b
    assert sum(1 for g, _ in a if g is None) == 64
