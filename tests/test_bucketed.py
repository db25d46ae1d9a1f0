"""Bucketed (co-located) storage: shuffle-free joins/aggs + sidecar
re-attach.  The claim under test is the PLAN, not just the rows: a join
of two co-bucketed tables must contain no Exchange on either side."""
import os

import pytest
from pyspark.sql import functions as F

from gqlite_spark.sources import bucketed


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def _mk(spark, n, seed):
    return spark.range(n).select(
        (F.col("id") % 97).alias("k"),
        (F.col("id") * seed % 1000).alias("val"))


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_cobucket_join_no_exchange(spark, tmp_path, no_broadcast):
    lt = bucketed.save_bucketed(_mk(spark, 5000, 3), str(tmp_path / "l"),
                                "k", 8, table="bkt_l")
    rt = bucketed.save_bucketed(_mk(spark, 3000, 7), str(tmp_path / "r"),
                                "k", 8, table="bkt_r")
    j = bucketed.cobucket_join(spark.table(lt), spark.table(rt), "k")
    plan = _plan(j)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan
    # row parity with the un-bucketed join
    expect = _mk(spark, 5000, 3).join(_mk(spark, 3000, 7), "k").count()
    assert j.count() == expect


def test_bucketed_agg_no_exchange(spark, tmp_path):
    t = bucketed.save_bucketed(_mk(spark, 4000, 5), str(tmp_path / "t"),
                               "k", 8, table="bkt_agg")
    agg = spark.table(t).groupBy("k").agg(F.sum("val").alias("s"))
    assert "Exchange" not in _plan(agg)
    # parity
    exp = {r["k"]: r["s"] for r in
           _mk(spark, 4000, 5).groupBy("k").agg(F.sum("val").alias("s"))
           .collect()}
    got = {r["k"]: r["s"] for r in agg.collect()}
    assert got == exp


def test_attach_bucketed_recovers_plan(spark, tmp_path, no_broadcast):
    """Simulates a fresh session: drop the catalog entries (external
    tables — files survive), re-attach from the sidecar spec, and the
    exchange-free join plan must come back."""
    bucketed.save_bucketed(_mk(spark, 5000, 3), str(tmp_path / "l"),
                           "k", 8, table="bkt_l2")
    bucketed.save_bucketed(_mk(spark, 3000, 7), str(tmp_path / "r2"),
                           "k", 8, table="bkt_r2")
    spark.sql("DROP TABLE bkt_l2")
    spark.sql("DROP TABLE bkt_r2")
    assert os.path.exists(tmp_path / "l" / bucketed.SPEC_FILE)
    left = bucketed.attach_bucketed(spark, str(tmp_path / "l"))
    right = bucketed.attach_bucketed(spark, str(tmp_path / "r2"))
    j = bucketed.cobucket_join(left, right, "k")
    plan = _plan(j)
    assert "SortMergeJoin" in plan and "Exchange" not in plan, plan
    expect = _mk(spark, 5000, 3).join(_mk(spark, 3000, 7), "k").count()
    assert j.count() == expect


def test_driver_entry_single_exchange(spark):
    """The `bucketed_join_revenue` driver entry: fact-fact join + per-
    order agg both ride the bucket layout, so exactly ONE Exchange
    remains — the final 5-row priority rollup."""
    import __spark_entry__ as entry
    df = entry.q_bucketed_join_revenue(spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert "SortMergeJoin" in plan
    assert plan.count("Exchange") == 1, plan
    assert df.count() == 5


def test_bucket_pruning_point_lookup(spark, tmp_path):
    """Equality on the bucket key prunes the scan to 1 bucket of files
    (SelectedBucketsCount in the scan node)."""
    t = bucketed.save_bucketed(_mk(spark, 5000, 3), str(tmp_path / "p"),
                               "k", 8, table="bkt_prune")
    # auto-bucketed-scan turns the bucketed read OFF when no join/agg
    # needs the distribution — which also forfeits bucket pruning; a
    # point-lookup-heavy workload pins it on for the session
    bucketed.force_bucketed_scan(spark, True)
    try:
        q = spark.table(t).filter(F.col("k") == 42)
        plan = _plan(q)
        assert "SelectedBucketsCount: 1 out of 8" in plan, plan
        assert q.count() == \
            _mk(spark, 5000, 3).filter(F.col("k") == 42).count()
    finally:
        bucketed.force_bucketed_scan(spark, False)


def test_append_bucketed_keeps_pruning_and_rows(spark, tmp_path,
                                                no_broadcast):
    """append_bucketed routes a batch into its hash buckets via
    insertInto: bucket files keep their ids (one new file per bucket
    per batch), point lookups still prune (SelectedBucketsCount), a
    co-bucketed join stays exchange-free over old AND new rows, and
    the sidecar's batch counter records the drift."""
    import re
    from gqlite_spark import fsio
    p = str(tmp_path / "ab")
    base = spark.range(0, 2000).selectExpr("id", "id % 9 as k")
    bucketed.save_bucketed(base, p, key="id", n_buckets=4,
                           table="t_append_b")
    bucketed.append_bucketed(
        spark.range(2000, 2100).selectExpr("id % 9 as k", "id"), p)
    t = spark.table("t_append_b")
    assert t.count() == 2100
    bucketed.force_bucketed_scan(spark, True)
    try:
        q = t.where("id = 2050")
        m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)",
                      _plan(q))
        assert m and (m.group(1), m.group(2)) == ("1", "4"), _plan(q)
        assert [(r["id"], r["k"]) for r in q.collect()] == [(2050, 7)]
    finally:
        bucketed.force_bucketed_scan(spark, False)
    # exchange-free join over the appended table
    p2 = str(tmp_path / "ab2")
    bucketed.save_bucketed(spark.range(0, 2100).selectExpr(
        "id", "id * 3 as w"), p2, key="id", n_buckets=4, table="t_ab2")
    j = bucketed.cobucket_join(t, spark.table("t_ab2"), "id")
    assert "Exchange" not in _plan(j), _plan(j)
    assert j.count() == 2100
    spec = fsio.read_json(spark, fsio.join(p, bucketed.SPEC_FILE))
    assert spec["batches"] == 1
    # batch lacking a table column is refused
    with pytest.raises(ValueError, match="lacks column"):
        bucketed.append_bucketed(spark.range(5).selectExpr("id"), p)


def test_rebucket_restores_one_file_per_bucket(spark, tmp_path,
                                               no_broadcast):
    """rebucket: the scheduled counterpart of append_bucketed — a
    swap-atomic re-export back to one file per bucket; rows, pruning
    and the exchange-free join survive, the staging table is cleaned
    up, and the batch counter resets."""
    import glob
    import re
    from gqlite_spark import fsio
    p = str(tmp_path / "rb")
    bucketed.save_bucketed(
        spark.range(0, 1200).selectExpr("id", "id % 5 as k"),
        p, key="id", n_buckets=4, table="t_rebkt")
    for lo in (1200, 1300):
        bucketed.append_bucketed(
            spark.range(lo, lo + 100).selectExpr("id", "id % 5 as k"), p)
    n_files = lambda: len(glob.glob(p + "/part-*.parquet"))
    assert n_files() == 12                  # 4 + 2 appends x 4
    bucketed.rebucket(spark, p)
    assert n_files() == 4                   # one file per bucket again
    t = spark.table("t_rebkt")
    assert t.count() == 1400
    assert not spark.catalog.tableExists("t_rebkt__rebucket_tmp")
    spec = fsio.read_json(spark, fsio.join(p, bucketed.SPEC_FILE))
    assert spec["table"] == "t_rebkt" and "batches" not in spec
    bucketed.force_bucketed_scan(spark, True)
    try:
        q = t.where("id = 1350")
        m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)",
                      _plan(q))
        assert m and (m.group(1), m.group(2)) == ("1", "4"), _plan(q)
        assert [(r["id"], r["k"]) for r in q.collect()] == [(1350, 0)]
    finally:
        bucketed.force_bucketed_scan(spark, False)
    # no leftover swap dirs or lease
    for suffix in (".rebucket_tmp", ".rebucket_old", ".rebucket_lock"):
        assert not fsio.exists(spark, p + suffix), suffix


def test_attach_and_append_heal_torn_rebucket(spark, tmp_path):
    """ADVICE r10 #2: a rebucket crash between swap_in's two renames
    leaves path missing and the only complete table at
    <path>.rebucket_old — attach_bucketed and append_bucketed must heal
    it at entry (mirroring clustered._heal) instead of failing on a raw
    missing-spec error until another rebucket runs."""
    from gqlite_spark import fsio
    p = f"file://{tmp_path}/thl"
    df = spark.range(0, 100).selectExpr("id as k", "id * 2 as v")
    bucketed.save_bucketed(df, p, key="k", n_buckets=4, table="t_heal1")
    spark.sql("DROP TABLE IF EXISTS t_heal1")
    fsio.rename(spark, p, p + ".rebucket_old")       # torn mid-swap
    got = bucketed.attach_bucketed(spark, p)         # heals + attaches
    assert got.count() == 100
    assert fsio.exists(spark, p)
    # torn again: append must heal too (it reads the spec first)
    spark.sql("DROP TABLE IF EXISTS t_heal1")
    fsio.rename(spark, p, p + ".rebucket_old")
    bucketed.append_bucketed(
        spark.range(100, 120).selectExpr("id as k", "id * 2 as v"), p)
    assert spark.table("t_heal1").count() == 120
