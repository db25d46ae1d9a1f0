"""Incremental rollup lifecycle: incremental == full recompute
(arrival order irrelevant), late data lands in old buckets, atomic
swap leaves a complete table, non-mergeable aggregates rejected."""

import pytest
from pyspark.sql import functions as F

from gqlite_spark.operators.rollup import (
    append_rollup, read_rollup, save_rollup)
from tests.conftest import SF_DIR

METRICS = {"value": ["sum", "min", "max"]}
EVERY = 3600


@pytest.fixture()
def events(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet")


def _rows(df):
    cols = sorted(df.columns)
    out = []
    for r in df.select(*cols).collect():
        vals = []
        for c in cols:
            v = r[c]
            vals.append(round(v, 6) if isinstance(v, float) else v)
        out.append(tuple(vals))
    return sorted(out)


def test_incremental_equals_full(spark, events, tmp_path):
    """Three arbitrary batches folded in one at a time must equal the
    one-shot rollup of all events — the mergeability contract."""
    p_inc = f"file:{tmp_path}/inc"
    p_full = f"file:{tmp_path}/full"
    b1 = events.filter(F.col("event_id") % 3 == 0)
    b2 = events.filter(F.col("event_id") % 3 == 1)
    b3 = events.filter(F.col("event_id") % 3 == 2)

    save_rollup(b1, p_inc, "ts", EVERY, dims=["event_type"],
                metrics=METRICS)
    append_rollup(b2, p_inc)
    append_rollup(b3, p_inc)
    save_rollup(events, p_full, "ts", EVERY, dims=["event_type"],
                metrics=METRICS)

    assert _rows(read_rollup(spark, p_inc)) \
        == _rows(read_rollup(spark, p_full))


def test_late_data_lands_in_old_bucket(spark, events, tmp_path):
    """An out-of-order batch (the EARLIEST events arriving last) merges
    into already-written buckets, not a new one."""
    p = f"file:{tmp_path}/late"
    cut = events.agg(F.min("ts")).collect()[0][0]
    late = events.filter(F.col("ts") == F.lit(cut))
    rest = events.filter(F.col("ts") != F.lit(cut))
    save_rollup(rest, p, "ts", EVERY, metrics=METRICS)
    n_buckets_before = read_rollup(spark, p).count()
    append_rollup(late, p)
    after = read_rollup(spark, p)
    # the late rows' bucket already existed (same hour as other events)
    # or adds exactly the buckets a full recompute would have
    p_full = f"file:{tmp_path}/late_full"
    save_rollup(events, p_full, "ts", EVERY, metrics=METRICS)
    assert _rows(after) == _rows(read_rollup(spark, p_full))
    assert after.count() >= n_buckets_before


def test_read_rollup_avg_and_counts(spark, events, tmp_path):
    p = f"file:{tmp_path}/avg"
    save_rollup(events, p, "ts", EVERY, metrics=METRICS)
    got = read_rollup(spark, p, avg_of=["value"])
    assert "avg_value" in got.columns
    total = got.agg(F.sum("n")).collect()[0][0]
    assert total == events.count()
    one = got.orderBy("bucket_start").first()
    assert abs(one["avg_value"] - one["sum_value"] / one["n"]) < 1e-12


def test_non_mergeable_rejected(events, tmp_path):
    with pytest.raises(ValueError, match="not mergeable"):
        save_rollup(events, f"file:{tmp_path}/bad", "ts", EVERY,
                    metrics={"value": ["avg"]})


def test_swap_leaves_spec_and_batches_counter(spark, events, tmp_path):
    from gqlite_spark import fsio
    p = f"file:{tmp_path}/spec"
    save_rollup(events.limit(100), p, "ts", EVERY, metrics=METRICS)
    append_rollup(events.limit(50), p)
    spec = fsio.read_json(spark, fsio.join(p, "_rollup_spec.json"))
    assert spec["batches"] == 1 and spec["every"] == EVERY
    # no tmp/old residue after the swap
    assert not fsio.exists(spark, p + ".rollup_tmp")
    assert not fsio.exists(spark, p + ".rollup_old")


def test_heal_restores_torn_swap(spark, events, tmp_path):
    """A crash between the two swap renames parks the table at
    .rollup_old; the next touch heals it back."""
    from gqlite_spark import fsio
    p = f"file:{tmp_path}/heal"
    save_rollup(events, p, "ts", EVERY, metrics=METRICS)
    want = _rows(read_rollup(spark, p))
    fsio.rename(spark, p, p + ".rollup_old")   # simulate the torn state
    assert not fsio.exists(spark, p)
    got = _rows(read_rollup(spark, p))         # heals on entry
    assert got == want and fsio.exists(spark, p)
    # append also works right after a heal
    fsio.rename(spark, p, p + ".rollup_old")
    assert append_rollup(events.limit(10), p) is True


def test_append_epoch_idempotent(spark, events, tmp_path):
    """A replayed epoch id is skipped, not double-counted — the
    exactly-once guard under foreachBatch replay."""
    p = f"file:{tmp_path}/epoch"
    save_rollup(events.filter(F.col("event_id") % 2 == 0), p, "ts",
                EVERY, metrics=METRICS)
    batch = events.filter(F.col("event_id") % 2 == 1)
    assert append_rollup(batch, p, epoch_id=0) is True
    once = _rows(read_rollup(spark, p))
    assert append_rollup(batch, p, epoch_id=0) is False   # replay
    assert _rows(read_rollup(spark, p)) == once
    assert append_rollup(batch.limit(5), p, epoch_id=1) is True


def test_stream_rollup_matches_batch(spark, events, tmp_path):
    """stream_rollup folds each micro-batch into the at-rest rollup;
    after two runs over a growing directory (same checkpoint), the
    result equals the one-shot batch rollup of everything."""
    from gqlite_spark.streaming.events import (stream_from_directory,
                                               stream_rollup)
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    p = f"file:{tmp_path}/sru"
    a = events.filter(F.col("event_id") % 3 == 0)
    b = events.filter(F.col("event_id") % 3 != 0)
    a.coalesce(1).write.mode("append").parquet(src)

    save_rollup(events.limit(0), p, "ts", EVERY, metrics=METRICS)
    q = stream_rollup(stream_from_directory(spark, src), p,
                      checkpoint=ckpt)
    q.awaitTermination(120)
    p_a = f"file:{tmp_path}/full_a"
    save_rollup(a, p_a, "ts", EVERY, metrics=METRICS)
    assert _rows(read_rollup(spark, p)) == _rows(read_rollup(spark, p_a))

    b.coalesce(1).write.mode("append").parquet(src)
    q = stream_rollup(stream_from_directory(spark, src), p,
                      checkpoint=ckpt)   # same checkpoint: only file b
    q.awaitTermination(120)
    p_all = f"file:{tmp_path}/full_all"
    save_rollup(events, p_all, "ts", EVERY, metrics=METRICS)
    assert _rows(read_rollup(spark, p)) == _rows(read_rollup(spark, p_all))


def test_kmv_metric_incremental_equals_full(spark, events, tmp_path):
    """A per-bucket distinct sketch (metrics kmv) merges through the
    incremental lifecycle bit-for-bit: three folds == one-shot,
    including the sketch arrays and derived distinct column."""
    m = {"value": ["sum"], "user_id": ["kmv"]}
    p_inc, p_full = f"file:{tmp_path}/kinc", f"file:{tmp_path}/kfull"
    b1 = events.filter(F.col("event_id") % 3 == 0)
    b2 = events.filter(F.col("event_id") % 3 == 1)
    b3 = events.filter(F.col("event_id") % 3 == 2)
    save_rollup(b1, p_inc, "ts", EVERY, dims=["event_type"], metrics=m,
                kmv_k=32)
    append_rollup(b2, p_inc)
    append_rollup(b3, p_inc)
    save_rollup(events, p_full, "ts", EVERY, dims=["event_type"],
                metrics=m, kmv_k=32)
    inc = read_rollup(spark, p_inc)
    full = read_rollup(spark, p_full)
    assert "distinct_user_id" in inc.columns
    assert _rows(inc) == _rows(full)


def test_kmv_metric_distinct_is_exact_below_k(spark, events, tmp_path):
    """Per-bucket distinct_user_id == exact countDistinct when the
    bucket has fewer than kmv_k distinct users."""
    from gqlite_spark.operators.windows import epoch_seconds
    p = f"file:{tmp_path}/kexact"
    save_rollup(events, p, "ts", EVERY, metrics={"user_id": ["kmv"]},
                kmv_k=512)
    got = {r["bucket_start"]: r["distinct_user_id"]
           for r in read_rollup(spark, p).collect()}
    bucket = ((epoch_seconds(events, "ts") / EVERY).cast("long")
              * EVERY).alias("b")
    want = {r["b"]: r["d"] for r in
            events.select(bucket, "user_id").groupBy("b")
            .agg(F.countDistinct("user_id").alias("d")).collect()}
    exact = {b: d for b, d in want.items() if d < 512}
    assert exact and all(got[b] == d for b, d in exact.items())


def test_avg_ignores_null_metric_values(spark, tmp_path):
    """avg_<c> must be sum over NON-NULL count (SQL AVG), not over
    count(*)."""
    df = spark.createDataFrame(
        [(i, None if i % 2 else float(i)) for i in range(10)],
        "id int, value double").select(
        F.timestamp_seconds(F.lit(100)).alias("ts"), "value")
    p = f"file:{tmp_path}/avgnull"
    save_rollup(df, p, "ts", EVERY, metrics={"value": ["sum"]})
    row = read_rollup(spark, p, avg_of=["value"]).collect()[0]
    assert row["n"] == 10 and row["cnt_value"] == 5
    assert row["avg_value"] == (0 + 2 + 4 + 6 + 8) / 5.0


def test_kmv_metric_null_dim_keeps_sketch(spark, tmp_path):
    """A NULL dim value is a real group: its per-bucket sketch must
    not be dropped to an empty array by a null-unsafe join."""
    df = spark.createDataFrame(
        [(1, "a", 10), (2, None, 11), (3, None, 12), (4, "a", 11)],
        "id int, et string, uid int").select(
        F.timestamp_seconds(F.lit(50)).alias("ts"), "et", "uid")
    p = f"file:{tmp_path}/nulldim"
    save_rollup(df, p, "ts", EVERY, dims=["et"],
                metrics={"uid": ["kmv"]}, kmv_k=16)
    got = {r["et"]: r["distinct_uid"]
           for r in read_rollup(spark, p).collect()}
    assert got["a"] == 2 and got[None] == 2


def test_hist_metric_incremental_equals_full(spark, events, tmp_path):
    """Per-bucket histogram maps merge through the lifecycle: three
    folds == one-shot, and rollup_quantiles serves per-bucket p50/p99
    from the rollup alone."""
    from gqlite_spark.operators.rollup import rollup_quantiles
    m = {"value": ["sum", "hist"]}
    hp = {"value": (0.0, 1000.0, 100)}
    p_inc, p_full = f"file:{tmp_path}/hinc", f"file:{tmp_path}/hfull"
    b1 = events.filter(F.col("event_id") % 3 == 0)
    b2 = events.filter(F.col("event_id") % 3 == 1)
    b3 = events.filter(F.col("event_id") % 3 == 2)
    save_rollup(b1, p_inc, "ts", EVERY, metrics=m, hist_params=hp)
    append_rollup(b2, p_inc)
    append_rollup(b3, p_inc)
    save_rollup(events, p_full, "ts", EVERY, metrics=m, hist_params=hp)

    def maps(path):
        return {r["bucket_start"]: sorted(r["hist_value"].items())
                for r in read_rollup(spark, path).collect()}
    assert maps(p_inc) == maps(p_full)

    qi = {(r["bucket_start"], r["q"]): r["value"] for r in
          rollup_quantiles(spark, p_inc, "value", [0.5, 0.99]).collect()}
    qf = {(r["bucket_start"], r["q"]): r["value"] for r in
          rollup_quantiles(spark, p_full, "value", [0.5, 0.99]).collect()}
    assert qi == qf and qi
    # spot-check one bucket's p50 against the exact per-bucket median
    from gqlite_spark.operators.windows import epoch_seconds
    bucket = (F.floor(epoch_seconds(events, "ts") / EVERY)
              * EVERY).cast("long").alias("b")
    some_b = sorted(k[0] for k in qi)[0]
    exact = (events.select(bucket, "value").filter(F.col("b") == some_b)
             .agg(F.expr("percentile(value, 0.5)")).collect()[0][0])
    assert abs(qi[(some_b, 0.5)] - exact) <= 10.0 + 1e-9  # bin width


def test_hist_metric_requires_params(events, tmp_path):
    with pytest.raises(ValueError, match="hist_params"):
        save_rollup(events, f"file:{tmp_path}/hbad", "ts", EVERY,
                    metrics={"value": ["hist"]})


def test_hist_params_must_match_metrics(events, tmp_path):
    """hist_params for a column without a 'hist' metric fails at save
    time, not later inside rollup_quantiles."""
    with pytest.raises(ValueError, match="lack 'hist'"):
        save_rollup(events, f"file:{tmp_path}/orph", "ts", EVERY,
                    metrics={"value": ["sum"]},
                    hist_params={"value": (0.0, 1000.0, 10)})


def test_quantiles_cover_all_null_buckets(spark, tmp_path):
    """A bucket whose metric was all-NULL shows up in the quantile
    report with value NULL instead of vanishing."""
    from gqlite_spark.operators.rollup import rollup_quantiles
    df = spark.createDataFrame(
        [(100, 5.0), (200, 7.0), (7300, None)],
        "t int, v double").select(
        F.timestamp_seconds("t").alias("ts"), "v")
    p = f"file:{tmp_path}/nullq"
    save_rollup(df, p, "ts", EVERY, metrics={"v": ["hist"]},
                hist_params={"v": (0.0, 10.0, 10)})
    got = {(r["bucket_start"], r["q"]): r["value"]
           for r in rollup_quantiles(spark, p, "v", [0.5]).collect()}
    assert got[(7200, 0.5)] is None
    assert abs(got[(0, 0.5)] - 6.0) <= 1.0 + 1e-9


def test_coarsen_hour_to_day_equals_direct(spark, events, tmp_path):
    """Coarsening an hourly rollup to daily == building daily from the
    raw events, exactly, for scalar, kmv AND hist metrics."""
    from gqlite_spark.operators.rollup import coarsen_rollup
    m = {"value": ["sum", "min", "hist"], "user_id": ["kmv"]}
    hp = {"value": (0.0, 1000.0, 50)}
    ph = f"file:{tmp_path}/hourly"
    pd_ = f"file:{tmp_path}/daily"
    pref = f"file:{tmp_path}/daily_direct"
    save_rollup(events, ph, "ts", 3600, dims=["event_type"],
                metrics=m, kmv_k=64, hist_params=hp)
    coarsen_rollup(spark, ph, pd_, 86400)
    save_rollup(events, pref, "ts", 86400, dims=["event_type"],
                metrics=m, kmv_k=64, hist_params=hp)

    def canon(path):
        out = []
        for r in read_rollup(spark, path).collect():
            d = r.asDict()
            d["hist_value"] = sorted(d["hist_value"].items())
            # double sums drift in the last ulp between the partials
            # order and the raw order (same convention as _rows)
            d = {k: round(v, 6) if isinstance(v, float) else v
                 for k, v in d.items()}
            out.append(tuple(sorted(d.items())))
        return sorted(out)
    assert canon(pd_) == canon(pref)
    with pytest.raises(ValueError, match="multiple"):
        coarsen_rollup(spark, ph, pd_, 5400)


def test_concurrent_append_rejected_cleanly(spark, events, tmp_path):
    """Single-writer contract (VERDICT r8 next #4): with another
    writer's lease held, append_rollup errors cleanly and the table
    (data + spec) is untouched."""
    from gqlite_spark import fsio
    p = f"file:{tmp_path}/cc"
    save_rollup(events.filter(F.col("event_id") % 2 == 0), p, "ts",
                EVERY, dims=["event_type"], metrics=METRICS)
    before = _rows(read_rollup(spark, p))
    lock = p + ".rollup_lock"
    assert fsio.create_exclusive(spark, lock, "writer A mid-swap")
    with pytest.raises(fsio.ConcurrentWriterError):
        append_rollup(events.filter(F.col("event_id") % 2 == 1), p)
    fsio.delete(spark, lock, recursive=False)
    assert _rows(read_rollup(spark, p)) == before
    # lease released -> the retry folds the batch in normally
    assert append_rollup(events.filter(F.col("event_id") % 2 == 1), p)
    p_full = f"file:{tmp_path}/cc_full"
    save_rollup(events, p_full, "ts", EVERY, dims=["event_type"],
                metrics=METRICS)
    assert _rows(read_rollup(spark, p)) == _rows(read_rollup(spark, p_full))


def test_coarsen_rejects_in_place(spark, events, tmp_path):
    """ADVICE r8 #2: out_path == path would truncate the directory the
    lazy source read streams from."""
    from gqlite_spark.operators.rollup import coarsen_rollup
    p = f"file:{tmp_path}/inplace"
    save_rollup(events, p, "ts", EVERY, metrics=METRICS)
    with pytest.raises(ValueError, match="differ"):
        coarsen_rollup(spark, p, p, 86400)
    with pytest.raises(ValueError, match="differ"):
        coarsen_rollup(spark, p, p + "/", 86400)


def test_coarsen_refresh_swaps_atomically(spark, events, tmp_path):
    """Re-coarsening onto an existing coarse table goes through the
    same rewrite-then-swap contract as append (not a bare overwrite):
    the refreshed table is complete and correct."""
    from gqlite_spark.operators.rollup import coarsen_rollup
    ph = f"file:{tmp_path}/hr"
    pd_ = f"file:{tmp_path}/dy"
    half = events.filter(F.col("event_id") % 2 == 0)
    save_rollup(half, ph, "ts", 3600, dims=["event_type"],
                metrics=METRICS)
    coarsen_rollup(spark, ph, pd_, 86400)
    append_rollup(events.filter(F.col("event_id") % 2 == 1), ph)
    coarsen_rollup(spark, ph, pd_, 86400)  # refresh over existing
    pref = f"file:{tmp_path}/dy_direct"
    save_rollup(events, pref, "ts", 86400, dims=["event_type"],
                metrics=METRICS)
    assert _rows(read_rollup(spark, pd_)) == _rows(read_rollup(spark, pref))
    # no lifecycle droppings left beside the refreshed table
    from gqlite_spark import fsio
    for suffix in (".rollup_tmp", ".rollup_old", ".rollup_lock"):
        assert not fsio.exists(spark, pd_ + suffix)


def test_stream_rollup_sketch_metrics_match_batch(spark, events, tmp_path):
    """VERDICT r8 next #5: ALL THREE sketch metrics (kmv + hist +
    cms) flow through the STREAMING twin — after two runs over a
    growing directory with the same checkpoint (run 2 is a restart
    folding only the new file), the stored sketches, the distinct
    estimates AND the served quantiles equal the one-shot batch rollup
    of everything; a replay run folds nothing (exactly-once)."""
    from gqlite_spark.operators.rollup import rollup_quantiles
    from gqlite_spark.streaming.events import (stream_from_directory,
                                               stream_rollup)
    m = {"value": ["sum", "hist"], "user_id": ["kmv", "cms"]}
    hp = {"value": (0.0, 1000.0, 40)}
    cp = {"user_id": (4, 512)}
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    p = f"file:{tmp_path}/skru"
    a = events.filter(F.col("event_id") % 3 == 0)
    b = events.filter(F.col("event_id") % 3 != 0)
    a.coalesce(1).write.mode("append").parquet(src)
    save_rollup(events.limit(0), p, "ts", EVERY, dims=["event_type"],
                metrics=m, kmv_k=64, hist_params=hp, cms_params=cp)

    stream_rollup(stream_from_directory(spark, src), p,
                  checkpoint=ckpt).awaitTermination(120)
    b.coalesce(1).write.mode("append").parquet(src)
    # restart: a fresh query from the same checkpoint folds only b
    stream_rollup(stream_from_directory(spark, src), p,
                  checkpoint=ckpt).awaitTermination(120)

    p_ref = f"file:{tmp_path}/oneshot"
    save_rollup(events, p_ref, "ts", EVERY, dims=["event_type"],
                metrics=m, kmv_k=64, hist_params=hp, cms_params=cp)

    def canon(path):
        out = []
        for r in read_rollup(spark, path).collect():
            d = r.asDict()
            d["hist_value"] = sorted(d["hist_value"].items())
            d["cms_user_id"] = sorted(d["cms_user_id"].items())
            d["kmv_user_id"] = tuple(d["kmv_user_id"])
            d = {k: round(v, 6) if isinstance(v, float) else v
                 for k, v in d.items()}
            out.append(tuple(sorted(d.items())))
        return sorted(out)

    assert canon(p) == canon(p_ref)
    # served artifacts match too: distinct estimates + quantiles
    def qrows(path):
        return sorted(
            (r["bucket_start"], r["event_type"], r["q"],
             None if r["value"] is None else round(r["value"], 9))
            for r in rollup_quantiles(spark, path, "value",
                                      [0.5, 0.99]).collect())
    assert qrows(p) == qrows(p_ref)
    # replay run over the unchanged directory: nothing new folds
    from gqlite_spark import fsio

    def batches():
        return fsio.read_json(spark, p + "/_rollup_spec.json")["batches"]

    before = batches()
    stream_rollup(stream_from_directory(spark, src), p,
                  checkpoint=ckpt).awaitTermination(120)
    assert batches() == before
    assert canon(p) == canon(p_ref)


def test_cms_metric_incremental_equals_full(spark, events, tmp_path):
    """The cms metric rides the same lifecycle: three arbitrary
    batches folded in one at a time == the one-shot rollup, map-exact;
    coarsening to daily stays exact; and the served per-key estimates
    equal the EXACT per-bucket counts on this corpus (collision-free
    at d=4, w=2048 — deterministic, so a fact, not luck)."""
    from gqlite_spark.operators.rollup import (coarsen_rollup,
                                               rollup_keycounts)
    m = {"user_id": ["cms"]}
    cp = {"user_id": (4, 2048)}
    p_inc = f"file:{tmp_path}/cinc"
    p_full = f"file:{tmp_path}/cfull"
    b1 = events.filter(F.col("event_id") % 3 == 0)
    b2 = events.filter(F.col("event_id") % 3 == 1)
    b3 = events.filter(F.col("event_id") % 3 == 2)
    save_rollup(b1, p_inc, "ts", EVERY, dims=["event_type"],
                metrics=m, cms_params=cp)
    append_rollup(b2, p_inc)
    append_rollup(b3, p_inc)
    save_rollup(events, p_full, "ts", EVERY, dims=["event_type"],
                metrics=m, cms_params=cp)

    def canon(path):
        out = []
        for r in read_rollup(spark, path).collect():
            d = r.asDict()
            d["cms_user_id"] = sorted(d["cms_user_id"].items())
            out.append(tuple(sorted(d.items())))
        return sorted(out)
    assert canon(p_inc) == canon(p_full)

    keys = [r["user_id"] for r in
            events.select("user_id").distinct().orderBy("user_id")
            .limit(3).collect()] + [10**15]
    got = {(r["bucket_start"], r["event_type"], r["key"]): r["count_est"]
           for r in rollup_keycounts(spark, p_inc, "user_id",
                                     keys).collect()}
    from gqlite_spark.operators.windows import epoch_seconds
    exact = {(r["b"], r["event_type"], r["user_id"]): r["n"]
             for r in events
             .withColumn("b", (F.floor(epoch_seconds(events, "ts")
                                       / EVERY) * EVERY).cast("long"))
             .filter(F.col("user_id").isin(keys))
             .groupBy("b", "event_type", "user_id")
             .agg(F.count("*").alias("n")).collect()}
    for (b, et, k), est in got.items():
        assert est == exact.get((b, et, k), 0), (b, et, k, est)

    # daily cascade stays exact (counter maps re-merge bin-wise)
    pd_ = f"file:{tmp_path}/cday"
    pref = f"file:{tmp_path}/cday_direct"
    coarsen_rollup(spark, p_inc, pd_, 86400)
    save_rollup(events, pref, "ts", 86400, dims=["event_type"],
                metrics=m, cms_params=cp)
    assert canon(pd_) == canon(pref)


def test_cms_params_must_match_metrics(events, tmp_path):
    with pytest.raises(ValueError, match="lack 'cms'"):
        save_rollup(events, f"file:{tmp_path}/cx", "ts", EVERY,
                    metrics={"value": ["sum"]},
                    cms_params={"value": (4, 64)})
    with pytest.raises(ValueError, match="needs cms_params"):
        save_rollup(events, f"file:{tmp_path}/cy", "ts", EVERY,
                    metrics={"user_id": ["cms"]})
