"""Count-min sketch: deterministic mergeable per-key frequency
profiling (the third mergeable sketch beside KMV and hist).

Estimates never undercount; merge == sketch-of-union bit-for-bit; the
md5-60bit row hashes replay exactly in DuckDB (rehearsed entry-shaped
in test_r10_oracle_candidates.py)."""

from pyspark.sql import functions as F

from gqlite_spark.operators.stats import cms_merge, cms_query, cms_sketch

D, W = 4, 1024


def _fixture(spark):
    # 40 distinct users with known skewed counts: user u occurs u+1 times
    rows = [(u, i) for u in range(40) for i in range(u + 1)]
    return spark.createDataFrame(rows, "user_id long, i long")


def _keys(spark, ks):
    return spark.createDataFrame([(k,) for k in ks], "key long")


def test_estimates_match_exact_counts(spark):
    df = _fixture(spark)
    sk = cms_sketch(df, "user_id", D, W)
    got = {r["key"]: r["count_est"] for r in
           cms_query(sk, _keys(spark, [0, 7, 39, 999]), D, W).collect()}
    # never undercounts; at 40 keys over 4x1024 counters the fixture
    # is collision-free (deterministic, so this is a fact, not luck)
    assert got[0] == 1 and got[7] == 8 and got[39] == 40
    assert got[999] == 0            # never-seen key


def test_merge_equals_whole_data_sketch(spark):
    df = _fixture(spark)
    a = df.filter(F.col("i") % 2 == 0)
    b = df.filter(F.col("i") % 2 == 1)
    merged = cms_merge([cms_sketch(a, "user_id", D, W),
                        cms_sketch(b, "user_id", D, W)])
    whole = cms_sketch(df, "user_id", D, W)
    rows = lambda s: sorted(map(tuple, s.collect()))
    assert rows(merged) == rows(whole)


def test_per_group_matches_solo(spark):
    df = _fixture(spark).withColumn("g", F.col("user_id") % 2)
    sk = cms_sketch(df, "user_id", D, W, by=["g"])
    got = {(r["g"], r["key"]): r["count_est"] for r in
           cms_query(sk, _keys(spark, [6, 7]), D, W, by=["g"]).collect()}
    # user 6 lives only in group 0, user 7 only in group 1
    assert got[(0, 6)] == 7 and got[(1, 6)] == 0
    assert got[(1, 7)] == 8 and got[(0, 7)] == 0


def test_null_group_key_is_a_real_group(spark):
    """A NULL group key is a real group (same invariant as
    rollup_keycounts): its keys must estimate their true counts, not 0
    — a plain name-list equijoin in cms_query would never match the
    NULL-keyed sketch rows and silently undercount."""
    rows = [(6, "a")] * 3 + [(6, None)] * 5 + [(7, None)] * 2
    df = spark.createDataFrame(rows, "user_id long, g string")
    sk = cms_sketch(df, "user_id", D, W, by=["g"])
    got = {(r["g"], r["key"]): r["count_est"] for r in
           cms_query(sk, _keys(spark, [6, 7]), D, W, by=["g"]).collect()}
    assert got[(None, 6)] == 5 and got[(None, 7)] == 2
    assert got[("a", 6)] == 3 and got[("a", 7)] == 0


def test_null_is_not_a_value(spark):
    df = spark.createDataFrame([(1,), (1,), (None,)], "k int")
    sk = cms_sketch(df, "k", D, W)
    assert sk.agg(F.sum("n")).collect()[0][0] == 2 * D


def test_state_is_bounded(spark):
    """The sketch never exceeds d*w rows no matter the data size."""
    df = spark.range(0, 50000).selectExpr("id % 9000 as k")
    sk = cms_sketch(df, "k", d=2, w=64)
    assert sk.count() <= 2 * 64
    # and total mass per row is exactly the row count
    per_row = {r["row"]: r["s"] for r in
               sk.groupBy("row").agg(F.sum("n").alias("s")).collect()}
    assert per_row == {0: 50000, 1: 50000}
