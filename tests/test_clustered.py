"""Sort-clustered (range / z-order) layout: row parity + the actual
claim — parquet footer min/max stats narrow enough that selective scans
skip most files, on EVERY clustering column for z-order."""
import pytest
from pyspark.sql import functions as F

from gqlite_spark.sources import clustered


def _grid(spark):
    # uniform 256 x 256 grid: a = id // 256, b = id % 256
    return spark.range(256 * 256).select(
        (F.col("id") / 256).cast("long").alias("a"),
        (F.col("id") % 256).alias("b"),
        (F.col("id") * 7 % 1000).alias("val"))


def test_range_layout_parity_and_skipping(spark, tmp_path):
    p = str(tmp_path / "rng")
    clustered.save_clustered(_grid(spark), p, ["a"], n_files=16)
    back = spark.read.parquet(p)
    assert back.count() == 256 * 256
    assert back.agg(F.sum("val")).collect() == \
        _grid(spark).agg(F.sum("val")).collect()
    stats = clustered.file_stats(p, "a")
    assert len(stats) >= 8
    # a narrow a-range touches ~1-2 of the range-sorted files
    frac = clustered.overlap_fraction(stats, 10, 20)
    assert frac <= 0.3, (frac, stats)


def test_zorder_skips_on_both_columns(spark, tmp_path):
    p = str(tmp_path / "zord")
    clustered.save_clustered(_grid(spark), p, ["a", "b"], n_files=16)
    back = spark.read.parquet(p)
    # parity: the layout cannot change rows
    assert back.count() == 256 * 256
    assert back.agg(F.sum("val"), F.sum("a"), F.sum("b")).collect() == \
        _grid(spark).agg(F.sum("val"), F.sum("a"), F.sum("b")).collect()
    # the z-order property: a selective predicate on EITHER column
    # skips most files (Morton blocks bound both coordinates)
    for col in ("a", "b"):
        stats = clustered.file_stats(p, col)
        assert len(stats) >= 8
        frac = clustered.overlap_fraction(stats, 0, 31)   # 1/8 of space
        assert frac <= 0.6, (col, frac, stats)


def test_single_sort_does_not_skip_secondary(spark, tmp_path):
    """The control: a range layout on `a` gives NO skipping on `b` —
    the gap z-order exists to close."""
    p = str(tmp_path / "ctl")
    clustered.save_clustered(_grid(spark), p, ["a"], n_files=16)
    stats = clustered.file_stats(p, "b")
    frac = clustered.overlap_fraction(stats, 0, 31)
    assert frac >= 0.9, (frac, stats)


def test_spec_sidecar(spark, tmp_path):
    from gqlite_spark import fsio
    p = str(tmp_path / "spec")
    clustered.save_clustered(_grid(spark), p, ["a", "b"], n_files=8)
    spec = fsio.read_json(spark, fsio.join(p, clustered.SPEC_FILE))
    assert spec["cols"] == ["a", "b"] and spec["n_files"] == 8
    assert spec["ranges"] == [[0.0, 255.0], [0.0, 255.0]]


def test_zvalue_interleave_known_values(spark):
    """Pin the Morton interleave: with ranges [0, 2^bits - 1] the bin
    IS the value, and z of (a=1, b=0) = 1, (0,1) = 2, (1,1) = 3,
    (2,0) = 4 — the textbook 2D Morton codes."""
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (1, 1), (2, 0), (3, 3)], "a int, b int")
    # bins are width_bucket over [0, 3] with 4 bins -> identity
    z = clustered.zvalue_col(["a", "b"], [(0, 3), (0, 3)], bits=2)
    got = {(r["a"], r["b"]): r["z"]
           for r in df.withColumn("z", z).collect()}
    assert got == {(0, 0): 0, (1, 0): 1, (0, 1): 2, (1, 1): 3,
                   (2, 0): 4, (3, 3): 15}


def test_driver_entry_pushdown(spark):
    """The `zorder_scan_revenue` entry: both range predicates must reach
    the parquet scan (PushedFilters) — a cast-wrapped or expression-
    wrapped key would silently forfeit the stats skipping the layout
    exists for."""
    import io
    import contextlib
    import __spark_entry__ as entry
    df = entry.q_zorder_scan_revenue(spark, "/root/testdata/sf0.001")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "LessThanOrEqual(l_orderkey," in plan, plan
    assert "LessThanOrEqual(l_suppkey," in plan, plan
    rows = df.collect()
    assert len(rows) >= 1
    assert set(df.columns) == {"l_returnflag", "revenue_cents", "n_items"}


def test_append_then_recluster_lifecycle(spark, tmp_path):
    """Appends degrade file-level skipping gradually (sorted batches:
    row parity always holds); recluster restores the write-time layout
    via rewrite-then-swap."""
    from gqlite_spark.sources.clustered import (append_clustered,
                                                recluster)
    p = str(tmp_path / "life")
    base = _grid(spark).filter(F.col("a") < 192)
    extra = _grid(spark).filter(F.col("a") >= 192)
    clustered.save_clustered(base, p, ["a"], n_files=16)
    tight = clustered.overlap_fraction(clustered.file_stats(p, "a"),
                                       10, 20)
    append_clustered(extra, p)
    total = spark.read.parquet(p)
    assert total.count() == 256 * 256
    # the batch file spans a in [192, 255]: the [10, 20] slice still
    # skips it, and overall overlap stays bounded
    drift = clustered.overlap_fraction(clustered.file_stats(p, "a"),
                                       10, 20)
    assert drift <= tight + 0.1, (tight, drift)
    # a slice inside the appended range now touches base files too? no:
    # base files stop at 191, so [200, 210] touches ONLY the batch file
    hi = clustered.overlap_fraction(clustered.file_stats(p, "a"),
                                    200, 210)
    assert hi <= 0.3, hi
    recluster(spark, p)
    back = spark.read.parquet(p)
    assert back.count() == 256 * 256
    assert back.agg(F.sum("val")).collect() == \
        _grid(spark).agg(F.sum("val")).collect()
    st = clustered.file_stats(p, "a")
    assert len(st) == 16
    assert clustered.overlap_fraction(st, 10, 20) <= 0.3
    assert not (tmp_path / "life.recluster_tmp").exists()
    assert not (tmp_path / "life.recluster_old").exists()


def test_append_zorder_uses_stored_ranges(spark, tmp_path):
    """z-append bins with the STORED ranges: rows outside the original
    min/max clamp into the edge bins (documented), parity holds, and
    both-column skipping still works on the original region."""
    from gqlite_spark.sources.clustered import append_clustered
    p = str(tmp_path / "zlife")
    clustered.save_clustered(_grid(spark), p, ["a", "b"], n_files=16)
    extra = spark.range(100).select(
        (F.col("id") + 300).alias("a"),   # beyond the stored a-range
        (F.col("id") % 256).alias("b"),
        F.lit(7).alias("val"))
    append_clustered(extra, p)
    assert spark.read.parquet(p).count() == 256 * 256 + 100
    for col in ("a", "b"):
        frac = clustered.overlap_fraction(
            clustered.file_stats(p, col), 0, 31)
        assert frac <= 0.7, (col, frac)


def test_append_clustered_epoch_replay_and_torn_repair(spark, tmp_path):
    """append_clustered now rides the shared guarded-append protocol
    (fsio.guarded_append, same as append_bucketed): epoch replays are
    skipped, a torn append (marker present, spec not committed) is
    repaired at the next entry with the batch landing exactly once,
    and recluster both repairs torn appends BEFORE rewriting and
    carries last_epoch forward so the rewrite can't reopen the replay
    window."""
    from gqlite_spark import fsio
    from gqlite_spark.sources.clustered import (append_clustered,
                                                recluster)
    p = str(tmp_path / "ep")
    clustered.save_clustered(_grid(spark), p, ["a"], n_files=8)
    extra = spark.range(100).select(
        (F.col("id") + 300).alias("a"), (F.col("id") % 7).alias("b"),
        F.lit(1).cast("long").alias("val"))
    assert append_clustered(extra, p, epoch_id=3) is True
    assert spark.read.parquet(p).count() == 256 * 256 + 100
    assert append_clustered(extra, p, epoch_id=3) is False   # replay
    assert append_clustered(extra, p, epoch_id=2) is False   # older
    assert spark.read.parquet(p).count() == 256 * 256 + 100
    # torn append: marker written, files landed, spec never committed
    spec = fsio.read_json(spark, fsio.join(p, clustered.SPEC_FILE))
    fsio.write_json(spark, fsio.join(p, "_append_inprogress.json"), {
        "epoch": 4, "batches_before": int(spec.get("batches", 0)),
        "files_before": fsio.list_names(spark, p)})
    extra.coalesce(1).write.mode("append").parquet(p)
    assert spark.read.parquet(p).count() == 256 * 256 + 200  # orphans
    assert append_clustered(extra, p, epoch_id=4) is True    # repairs
    assert spark.read.parquet(p).count() == 256 * 256 + 200  # once
    # recluster repairs a torn append before rewriting + keeps epoch
    fsio.write_json(spark, fsio.join(p, "_append_inprogress.json"), {
        "epoch": 9, "batches_before": 999,   # uncommitted
        "files_before": fsio.list_names(spark, p)})
    extra.coalesce(1).write.mode("append").parquet(p)
    recluster(spark, p)
    assert spark.read.parquet(p).count() == 256 * 256 + 200
    spec = fsio.read_json(spark, fsio.join(p, clustered.SPEC_FILE))
    assert spec["last_epoch"] == 4            # carried across rewrite
    assert append_clustered(extra, p, epoch_id=4) is False


def test_stream_append_clustered_matches_batch_with_restart(spark,
                                                            tmp_path):
    """The clustered streaming ingest twin: sorted micro-batches land
    in the layout across a restart on the same checkpoint; the result
    equals the one-shot batch content (nothing lost or doubled) and
    file-level skipping still prunes outside the appended range."""
    from gqlite_spark.streaming.events import (stream_append_clustered,
                                               stream_from_directory)
    p = str(tmp_path / "scl")
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    full = _grid(spark)
    clustered.save_clustered(full.filter("a < 128"), p, ["a"],
                             n_files=8)
    full.filter("a >= 128 and a < 192").coalesce(1) \
        .write.mode("append").parquet(src)
    schema = "a bigint, b bigint, val bigint"
    q = stream_append_clustered(
        stream_from_directory(spark, src, schema=schema), p,
        checkpoint=ckpt)
    q.awaitTermination(120)
    assert spark.read.parquet(p).count() == 192 * 256
    full.filter("a >= 192").coalesce(1).write.mode("append").parquet(src)
    q = stream_append_clustered(
        stream_from_directory(spark, src, schema=schema), p,
        checkpoint=ckpt)
    q.awaitTermination(120)
    got = spark.read.parquet(p)
    assert got.count() == 256 * 256
    assert got.agg(F.sum("val")).collect() == \
        full.agg(F.sum("val")).collect()
    # third run, nothing new: no-op
    q = stream_append_clustered(
        stream_from_directory(spark, src, schema=schema), p,
        checkpoint=ckpt)
    q.awaitTermination(120)
    assert spark.read.parquet(p).count() == 256 * 256
    # a low-range slice still skips the streamed batch files
    frac = clustered.overlap_fraction(clustered.file_stats(p, "a"),
                                      10, 20)
    assert frac <= 0.4, frac
