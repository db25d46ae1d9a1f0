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


def test_append_bucketed_epoch_replay_skipped(spark, tmp_path):
    """append_bucketed's epoch guard (the streaming twin's exactly-once
    contract, same lattice as append_rollup): a batch re-delivered with
    an id <= the sidecar's recorded one is skipped, a fresh id appends,
    and rebucket CARRIES last_epoch forward so the rewrite doesn't
    reopen the replay window."""
    from gqlite_spark import fsio
    p = str(tmp_path / "ep")
    bucketed.save_bucketed(
        spark.range(0, 300).selectExpr("id", "id % 5 as k"),
        p, key="id", n_buckets=4, table="t_epoch1")
    b = spark.range(300, 400).selectExpr("id", "id % 5 as k")
    assert bucketed.append_bucketed(b, p, epoch_id=5) is True
    assert spark.table("t_epoch1").count() == 400
    assert bucketed.append_bucketed(b, p, epoch_id=5) is False   # replay
    assert bucketed.append_bucketed(b, p, epoch_id=4) is False   # older
    assert spark.table("t_epoch1").count() == 400
    assert bucketed.append_bucketed(
        spark.range(400, 450).selectExpr("id", "id % 5 as k"),
        p, epoch_id=6) is True
    assert spark.table("t_epoch1").count() == 450
    bucketed.rebucket(spark, p)
    spec = fsio.read_json(spark, fsio.join(p, bucketed.SPEC_FILE))
    assert spec["last_epoch"] == 6            # carried across rebucket
    assert bucketed.append_bucketed(b, p, epoch_id=6) is False
    assert spark.table("t_epoch1").count() == 450


def test_append_bucketed_repairs_torn_append(spark, tmp_path):
    """A crash inside the insertInto->sidecar window leaves the marker
    behind: uncommitted orphan files are removed at the next entry and
    the replayed batch lands exactly once; if the crash was AFTER the
    sidecar commit (marker delete lost), the files are kept and the
    replay is skipped."""
    from gqlite_spark import fsio
    p = str(tmp_path / "torn")
    bucketed.save_bucketed(
        spark.range(0, 200).selectExpr("id", "id % 3 as k"),
        p, key="id", n_buckets=4, table="t_torn1")
    b = spark.range(200, 260).selectExpr("id", "id % 3 as k")
    # simulate a crash MID-append: marker written, files landed, no
    # sidecar commit
    spec = fsio.read_json(spark, fsio.join(p, bucketed.SPEC_FILE))
    fsio.write_json(spark, fsio.join(p, bucketed.APPEND_MARKER), {
        "epoch": 1, "batches_before": int(spec.get("batches", 0)),
        "files_before": fsio.list_names(spark, p)})
    (b.repartition(4, "id").sortWithinPartitions("id")
     .write.insertInto("t_torn1"))
    spark.catalog.refreshTable("t_torn1")
    assert spark.table("t_torn1").count() == 260   # orphans visible
    # the replayed batch repairs then re-appends exactly once
    assert bucketed.append_bucketed(b, p, epoch_id=1) is True
    spark.catalog.refreshTable("t_torn1")
    assert spark.table("t_torn1").count() == 260
    assert not fsio.exists(spark, fsio.join(p, bucketed.APPEND_MARKER))
    # simulate a crash AFTER the sidecar commit: marker left behind but
    # batches advanced -> repair keeps the files, replay is skipped
    fsio.write_json(spark, fsio.join(p, bucketed.APPEND_MARKER), {
        "epoch": 1, "batches_before": 0,
        "files_before": ["bogus-nothing"]})
    assert bucketed.append_bucketed(b, p, epoch_id=1) is False
    spark.catalog.refreshTable("t_torn1")
    assert spark.table("t_torn1").count() == 260
    assert not fsio.exists(spark, fsio.join(p, bucketed.APPEND_MARKER))
    # rebucket with a torn (uncommitted) marker: repair BEFORE the
    # rewrite, so orphans are not absorbed
    spec = fsio.read_json(spark, fsio.join(p, bucketed.SPEC_FILE))
    fsio.write_json(spark, fsio.join(p, bucketed.APPEND_MARKER), {
        "epoch": 9, "batches_before": int(spec.get("batches", 0)),
        "files_before": fsio.list_names(spark, p)})
    (spark.range(900, 950).selectExpr("id", "id % 3 as k")
     .repartition(4, "id").sortWithinPartitions("id")
     .write.insertInto("t_torn1"))
    bucketed.rebucket(spark, p)
    assert spark.table("t_torn1").count() == 260   # orphans gone


def test_stream_append_bucketed_matches_batch_with_restart(
        spark, tmp_path, no_broadcast):
    """The streaming ingest twin (VERDICT r10 next #4): micro-batches
    stream straight into the bucketed layout; across a restart on the
    same checkpoint the table equals the one-shot batch save (nothing
    lost or doubled), a third run with no new files is a no-op, and
    bucket pruning + the exchange-free co-bucketed join are live over
    streamed rows."""
    import re
    from gqlite_spark.streaming.events import (stream_append_bucketed,
                                               stream_from_directory)
    full = spark.range(0, 3000).selectExpr("id", "id % 11 as k")
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    p = str(tmp_path / "sab")
    bucketed.save_bucketed(full.filter("id < 1000"), p, key="id",
                           n_buckets=4, table="t_stream_b")
    full.filter("id >= 1000 and id < 2000").coalesce(1) \
        .write.mode("append").parquet(src)
    q = stream_append_bucketed(
        stream_from_directory(spark, src, schema="id long, k bigint"),
        p, checkpoint=ckpt)
    q.awaitTermination(120)
    assert spark.table("t_stream_b").count() == 2000
    # restart on the same checkpoint: only the NEW file is appended
    full.filter("id >= 2000").coalesce(1) \
        .write.mode("append").parquet(src)
    q = stream_append_bucketed(
        stream_from_directory(spark, src, schema="id long, k bigint"),
        p, checkpoint=ckpt)
    q.awaitTermination(120)
    spark.catalog.refreshTable("t_stream_b")
    t = spark.table("t_stream_b")
    assert t.count() == 3000
    assert t.groupBy().agg(F.sum("id").alias("s")).collect()[0]["s"] \
        == sum(range(3000))
    # third run, nothing new: no-op
    q = stream_append_bucketed(
        stream_from_directory(spark, src, schema="id long, k bigint"),
        p, checkpoint=ckpt)
    q.awaitTermination(120)
    spark.catalog.refreshTable("t_stream_b")
    assert spark.table("t_stream_b").count() == 3000
    # pruning + exchange-free join live over streamed rows
    bucketed.force_bucketed_scan(spark, True)
    try:
        q2 = spark.table("t_stream_b").where("id = 2500")
        m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)",
                      _plan(q2))
        assert m and (m.group(1), m.group(2)) == ("1", "4"), _plan(q2)
        assert [(r["id"], r["k"]) for r in q2.collect()] == [(2500, 3)]
    finally:
        bucketed.force_bucketed_scan(spark, False)
    p2 = str(tmp_path / "sab2")
    bucketed.save_bucketed(full.selectExpr("id", "id * 2 as w"), p2,
                           key="id", n_buckets=4, table="t_stream_b2")
    j = bucketed.cobucket_join(spark.table("t_stream_b"),
                               spark.table("t_stream_b2"), "id")
    assert "Exchange" not in _plan(j), _plan(j)
    assert j.count() == 3000


def test_stream_append_refreshes_parent_session_reads(spark, tmp_path):
    """r13 soak finding: foreachBatch hands each batch a CLONED
    SparkSession, so the insert's refresh lands on the clone's catalog
    — a parent session that read the table BEFORE the stream kept
    serving its stale cached file listing (counted 520k where 600k
    were committed).  stream_append_bucketed now refreshes the OUTER
    session's catalog entry after each committed batch, so a reader
    needs NO manual refreshTable to see streamed rows."""
    from gqlite_spark.streaming.events import (stream_append_bucketed,
                                               stream_from_directory)
    full = spark.range(0, 600).selectExpr("id", "id % 5 as k")
    src = str(tmp_path / "src")
    p = str(tmp_path / "frsh")
    bucketed.save_bucketed(full.filter("id < 200"), p, key="id",
                           n_buckets=4, table="t_fresh_b")
    # poison the parent session's file-index cache with a pre-read
    assert spark.table("t_fresh_b").count() == 200
    full.filter("id >= 200").coalesce(2) \
        .write.mode("append").parquet(src)
    q = stream_append_bucketed(
        stream_from_directory(spark, src, schema="id long, k bigint"),
        p, checkpoint=str(tmp_path / "ckpt"))
    assert q.awaitTermination(120)
    # NO manual refreshTable: the twin refreshed the outer session
    assert spark.table("t_fresh_b").count() == 600


def test_empty_batch_append_is_harmless(spark, tmp_path):
    """The streaming twins dropped their take(1) empty-batch guard
    (VERDICT r12 wrong #3) on the claim that an empty append under the
    epoch guard is harmless — pin it: the commit succeeds, the table
    is unchanged, and a replay of the empty epoch still skips.  Covers
    both layout kinds (the clustered twin relies on the same claim)."""
    from gqlite_spark.sources import clustered
    df = spark.range(100).selectExpr("id as k", "id % 5 as d")
    empty = df.limit(0)
    pb = str(tmp_path / "eb")
    bucketed.save_bucketed(df, pb, key="k", n_buckets=4,
                           table="t_empty_b")
    assert bucketed.append_bucketed(empty, pb, epoch_id=1) is True
    spark.catalog.refreshTable("t_empty_b")
    assert spark.table("t_empty_b").count() == 100
    assert bucketed.append_bucketed(empty, pb, epoch_id=1) is False
    pc = str(tmp_path / "ec")
    clustered.save_clustered(df, pc, ["k"], n_files=4)
    assert clustered.append_clustered(empty, pc, epoch_id=1) is True
    assert spark.read.parquet(pc).count() == 100
    assert clustered.append_clustered(empty, pc, epoch_id=1) is False


def test_append_and_rebucket_share_one_writer_lease(spark, tmp_path):
    """The swap rewrite and the in-place append hold the SAME
    <path>.maintain_lock lease, so they can never interleave: an
    append during a live rebucket (or vice versa) raises
    ConcurrentWriterError instead of writing into a directory that is
    about to be swapped out from under it."""
    import pytest
    from gqlite_spark import fsio
    p = str(tmp_path / "mx")
    bucketed.save_bucketed(
        spark.range(0, 100).selectExpr("id", "id % 3 as k"),
        p, key="id", n_buckets=4, table="t_mx1")
    assert fsio.create_exclusive(spark, p + ".maintain_lock",
                                 "nonce=other-writer")
    b = spark.range(100, 110).selectExpr("id", "id % 3 as k")
    with pytest.raises(fsio.ConcurrentWriterError):
        bucketed.append_bucketed(b, p)
    with pytest.raises(fsio.ConcurrentWriterError):
        bucketed.rebucket(spark, p)
    fsio.delete(spark, p + ".maintain_lock", recursive=False)
    assert bucketed.append_bucketed(b, p) is True
    assert spark.table("t_mx1").count() == 110


def test_stream_refresh_failure_warns_once_appends_continue(
        spark, tmp_path, monkeypatch):
    """VERDICT r13 wrong #3: the parent-session catalog refresh in
    stream_append_bucketed is a courtesy, but a PERMANENTLY failing
    refresh silently reintroduces the staleness bug the r13 soak
    caught.  It must warn ONCE per stream (not per batch, not never)
    and the appends themselves must keep committing."""
    import warnings

    from gqlite_spark.sources import bucketed as B
    from gqlite_spark.streaming.events import (stream_append_bucketed,
                                               stream_from_directory)
    full = spark.range(0, 400).selectExpr("id", "id % 5 as k")
    src = str(tmp_path / "src")
    p = str(tmp_path / "wrn")
    bucketed.save_bucketed(full.filter("id < 100"), p, key="id",
                           n_buckets=4, table="t_warn_b")

    def broken_table_name(sp, path):
        raise RuntimeError("catalog entry renamed away")

    monkeypatch.setattr(B, "table_name", broken_table_name)
    # several source files -> several micro-batches, ONE warning
    full.filter("id >= 100").repartition(3) \
        .write.mode("append").parquet(src)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        q = stream_append_bucketed(
            stream_from_directory(spark, src,
                                  schema="id long, k bigint"),
            p, checkpoint=str(tmp_path / "ckpt"))
        assert q.awaitTermination(120)
    ours = [w for w in rec
            if "parent-session catalog refresh failed" in str(w.message)]
    assert len(ours) == 1, [str(w.message) for w in rec]
    assert "catalog entry renamed away" in str(ours[0].message)
    # the appends still committed every batch
    spark.catalog.refreshTable("t_warn_b")
    assert spark.table("t_warn_b").count() == 400
