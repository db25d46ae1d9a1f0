"""Measure the STREAMING ingest lifecycle at probe scale (VERDICT r11
next #7): the sf-scale parity/restart tests prove correctness; this
measures the scaling shape the 100 TB continuous-ingest story depends
on, for both layout kinds:

1. per-batch protocol overhead — the marker/lease machinery around
   each micro-batch (lease claim + repair check + pre-write listing +
   marker write + spec commit + marker delete) costs a fixed number of
   driver-side FS metadata ops, independent of table size.  Measured
   directly: a guarded_append with a NO-OP write_fn on the 10 M-row
   table, and indirectly as (streamed wall − one-shot append wall) /
   n_batches;
2. micro-batch walls track the BATCH — streaming 2 M rows into a
   10 M-row bucketed table as 20 × 100 k batches should cost per-batch
   what a 100 k append costs, flat across the run (file-count growth
   per bucket is linear in batches and the append itself never reads
   the table);
3. file-count growth vs rebucket cadence — after N batches the table
   holds ~N × n_buckets extra files; a rebucket/recluster restores one
   file per bucket and its wall tracks the TABLE (it is the scheduled
   amortized rewrite).  Bucket pruning (SelectedBucketsCount) must
   survive the whole run;
4. recovery after a mid-stream kill — crash the query at batch K (an
   injected foreachBatch failure), restart from the same checkpoint,
   and verify the final count is EXACT (no loss, no double-append)
   while measuring the recovery run's wall;
5. LIST economics (VERDICT r12 wrong #1 'done' criterion) — a
   steady-state committed batch must perform exactly ONE directory
   listing (the pre-write manifest, which doubles as the orphan-temp
   sweep); counted by instrumenting fsio.list_names around a
   steady-state append.  Three LISTs per batch (manifest + a sweep
   inside each atomic sidecar write) was the protocol's dominant
   object-store cost at 10k+ files/table.

Run:  python tools/streaming_ingest_probe.py [n_base] [n_stream]
Defaults 10 M / 2 M.  Results recorded in PLANS.md.

Soak mode (VERDICT r12 next #7):
      python tools/streaming_ingest_probe.py soak [n_base] [n_stream]
Long-running multi-restart soak over BOTH layout kinds: a
deterministic kill schedule (several injected crashes at scattered
batches), a mid-stream rebucket/recluster between restart legs (the
rewrite shares the maintain lease with the appends and must carry
last_epoch forward), and an exact-count assertion after EVERY
recovery leg — the exactly-once contract under repeated failure, not
a single kill.

Dual-writer mode (VERDICT r13 next #4):
      python tools/streaming_ingest_probe.py soak dual [n_base] [n_stream]
The multi-restart soak proves recovery of ONE writer; this leg races
TWO live availableNow streams (same source, separate checkpoints —
the duplicate-run shape: a zombie driver plus its replacement, or an
operator double-starting a drain) at one table, for BOTH layout kinds
(bucketed and clustered — the same guarded_append protocol under each
kind's own lease).  The maintain lease serializes their commits (the
loser backs off on ConcurrentWriterError and retries) and the epoch
fence makes the retried batch a skip once its twin committed it —
asserted per kind: exactly ONE committed batch per epoch across both
writers, both streams drain, the final count is exact (zero lost, zero
duplicated), and a third fresh-checkpoint replay commits nothing.
"""
import re
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession, functions as F


def synth(spark, n, offset=0):
    return spark.range(n).select(
        (F.col("id") + offset).alias("k"),
        F.pmod(F.xxhash64(F.col("id") + offset), F.lit(1000)).alias("d"),
        (F.pmod(F.xxhash64(F.col("id") + offset + 7), F.lit(100_000))
         / 100.0).alias("v"))


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def _stream(spark, src):
    return (spark.readStream.format("parquet")
            .schema("k bigint, d bigint, v double")
            .option("maxFilesPerTrigger", 1)   # one file per batch
            .load(src))


def _count_listings(fsio, fn):
    """Run fn() with fsio.list_names instrumented; return the count."""
    calls = {"n": 0}
    orig = fsio.list_names

    def counting(spark_, path_, *a, **k):
        calls["n"] += 1
        return orig(spark_, path_, *a, **k)

    fsio.list_names = counting
    try:
        fn()
    finally:
        fsio.list_names = orig
    return calls["n"]


def main():
    args = [a for a in sys.argv[1:]]
    soak = bool(args) and args[0] == "soak"
    if soak:
        args = args[1:]
    dual = bool(args) and args[0] == "dual"
    if dual:
        args = args[1:]
    n_base = int(args[0]) if len(args) > 0 else 10_000_000
    n_stream = int(args[1]) if len(args) > 1 else 2_000_000
    n_batches = 20
    spark = (SparkSession.builder.master("local[16]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "8g")
             .appName("streaming_ingest_probe").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from gqlite_spark import fsio
    from gqlite_spark.sources import bucketed as B
    from gqlite_spark.sources import clustered as C
    if dual:
        return run_dual(spark, fsio, B, C, n_base, n_stream,
                        n_batches)
    if soak:
        return run_soak(spark, fsio, B, C, n_base, n_stream, n_batches)

    root = tempfile.mkdtemp(prefix="sing_probe_")
    nb = 64
    try:
        # -------- source files: n_batches parquet files
        src = f"{root}/src"
        (synth(spark, n_stream, offset=n_base)
         .repartition(n_batches).write.parquet(src))

        # ==================== bucketed twin ====================
        p = f"{root}/bkt"
        t = time.time()
        B.save_bucketed(synth(spark, n_base), p, key="k",
                        n_buckets=nb, table="t_probe")
        print(f"save_bucketed base n={n_base:,}  {time.time()-t:6.1f}s")

        # 1. pure protocol overhead: no-op guarded_append on the table
        for _ in range(2):
            t = time.time()
            fsio.guarded_append(spark, p, "maintain", B.SPEC_FILE,
                                None, lambda spec: None)
            print(f"protocol-only guarded_append (no-op write)   "
                  f"{time.time()-t:6.2f}s")

        # 5. LIST economics: steady-state batch == exactly ONE listing
        n_lists = _count_listings(
            fsio, lambda: fsio.guarded_append(
                spark, p, "maintain", B.SPEC_FILE, None,
                lambda spec: None))
        assert n_lists == 1, f"steady-state listings = {n_lists}, want 1"
        print(f"steady-state listings per batch: {n_lists} (protocol)")
        n_lists = _count_listings(
            fsio, lambda: B.append_bucketed(
                spark.read.parquet(src).limit(1000), p))
        assert n_lists == 1, f"real-append listings = {n_lists}, want 1"
        print(f"steady-state listings per batch: {n_lists} (real append)")
        # roll the probe rows back out before the measured sections
        shutil.rmtree(p)
        spark.sql("DROP TABLE IF EXISTS t_probe")
        B.save_bucketed(synth(spark, n_base), p, key="k",
                        n_buckets=nb, table="t_probe")

        # one-shot reference: the same 2 M rows as ONE append
        t = time.time()
        B.append_bucketed(spark.read.parquet(src), p)
        one_shot = time.time() - t
        print(f"one-shot append {n_stream:,} rows   {one_shot:6.1f}s")
        # roll it back for the streaming run (swap-rewrite to base)
        t = time.time()
        B.rebucket(spark, p)
        print(f"rebucket (n={n_base + n_stream:,})   "
              f"{time.time()-t:6.1f}s")
        shutil.rmtree(p)
        spark.sql("DROP TABLE IF EXISTS t_probe")
        B.save_bucketed(synth(spark, n_base), p, key="k",
                        n_buckets=nb, table="t_probe")

        # 2. streamed: per-batch walls via an instrumented foreachBatch
        walls = []

        def _fold(batch_df, batch_id):
            t0 = time.time()
            B.append_bucketed(batch_df, p, epoch_id=batch_id)
            walls.append(time.time() - t0)

        t = time.time()
        q = (_stream(spark, src).writeStream.foreachBatch(_fold)
             .option("checkpointLocation", f"{root}/ckpt_b")
             .trigger(availableNow=True).start())
        q.awaitTermination(1800)
        total = time.time() - t
        walls_s = " ".join(f"{w:.1f}" for w in walls)
        print(f"streamed {n_batches} batches x "
              f"{n_stream // n_batches:,} rows   {total:6.1f}s total")
        print(f"  per-batch walls: [{walls_s}]")
        print(f"  protocol+scheduling overhead vs one-shot: "
              f"{(total - one_shot) / max(len(walls), 1):6.2f}s/batch")

        # 3. file growth + pruning survival + rebucket cadence
        n_files = len([n for n in fsio.list_names(spark, p)
                       if not n.startswith("_")])
        # pruning check under the attach pin (auto heuristic drops the
        # bucketed read at high file counts; attached layouts pin it —
        # same contract as the r11 lifecycle probe)
        B.force_bucketed_scan(spark, True)
        try:
            lookup = spark.table("t_probe").where(F.col("k") == 12345)
            m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)",
                          _plan(lookup))
            print(f"after stream: {n_files} data files "
                  f"(~{n_files / nb:.1f}/bucket); pruning "
                  f"{m.group(0) if m else 'MISSING'}")
            assert lookup.count() == 1
        finally:
            B.force_bucketed_scan(spark, False)
        t = time.time()
        B.rebucket(spark, p)
        print(f"rebucket (n={n_base + n_stream:,})   "
              f"{time.time()-t:6.1f}s")
        n_files = len([n for n in fsio.list_names(spark, p)
                       if not n.startswith("_")])
        print(f"after rebucket: {n_files} data files")
        got = spark.table("t_probe").count()
        assert got == n_base + n_stream, (got, n_base + n_stream)
        print(f"count exact: {got:,}")

        # 4. mid-stream kill + recovery (fresh table, same source)
        shutil.rmtree(p)
        spark.sql("DROP TABLE IF EXISTS t_probe")
        B.save_bucketed(synth(spark, n_base), p, key="k",
                        n_buckets=nb, table="t_probe")
        boom_at = n_batches // 4

        def _fold_crash(batch_df, batch_id):
            if batch_id == boom_at:
                raise RuntimeError("injected mid-stream crash")
            B.append_bucketed(batch_df, p, epoch_id=batch_id)

        q = (_stream(spark, src).writeStream.foreachBatch(_fold_crash)
             .option("checkpointLocation", f"{root}/ckpt_k")
             .trigger(availableNow=True).start())
        try:
            q.awaitTermination(1800)
        except Exception:
            pass
        print(f"killed at batch {boom_at}; restarting from checkpoint")
        t = time.time()
        q = (_stream(spark, src).writeStream.foreachBatch(_fold)
             .option("checkpointLocation", f"{root}/ckpt_k")
             .trigger(availableNow=True).start())
        q.awaitTermination(1800)
        rec = time.time() - t
        got = spark.table("t_probe").count()
        assert got == n_base + n_stream, (got, n_base + n_stream)
        print(f"recovery run {rec:6.1f}s; count exact: {got:,}")

        # ==================== clustered twin ====================
        pc = f"{root}/clu"
        t = time.time()
        C.save_clustered(synth(spark, n_base), pc, ["v"], n_files=64)
        print(f"save_clustered base n={n_base:,}  "
              f"{time.time()-t:6.1f}s")
        cwalls = []

        def _foldc(batch_df, batch_id):
            t0 = time.time()
            C.append_clustered(batch_df, pc, epoch_id=batch_id)
            cwalls.append(time.time() - t0)

        t = time.time()
        q = (_stream(spark, src).writeStream.foreachBatch(_foldc)
             .option("checkpointLocation", f"{root}/ckpt_c")
             .trigger(availableNow=True).start())
        q.awaitTermination(1800)
        total = time.time() - t
        cw = " ".join(f"{w:.1f}" for w in cwalls)
        print(f"clustered streamed {n_batches} batches   "
              f"{total:6.1f}s total\n  per-batch walls: [{cw}]")
        t = time.time()
        C.recluster(spark, pc)
        print(f"recluster (n={n_base + n_stream:,})   "
              f"{time.time()-t:6.1f}s")
        got = spark.read.parquet(pc).count()
        assert got == n_base + n_stream, (got, n_base + n_stream)
        print(f"count exact: {got:,}")
    finally:
        spark.sql("DROP TABLE IF EXISTS t_probe")
        shutil.rmtree(root, ignore_errors=True)


def run_soak(spark, fsio, B, C, n_base, n_stream, n_batches):
    """Multi-restart soak (VERDICT r12 next #7): for EACH layout kind,
    drive the checkpointed stream through a deterministic schedule of
    injected crashes at scattered batches, restart after each, verify
    an EXACT count after every recovery leg, and — between two legs —
    run the swap rewrite (rebucket / recluster) under the shared
    maintain lease while the checkpoint is mid-source, proving the
    rewrite carries last_epoch forward and never reopens the
    exactly-once window."""
    import shutil as _sh

    root = tempfile.mkdtemp(prefix="sing_soak_")
    nb = 64
    # deterministic scatter: kills early, mid, late in the drain
    kills_b = sorted({max(1, n_batches // 7), n_batches // 2,
                      n_batches - 3})
    kills_c = sorted({2, n_batches // 3, n_batches - 5})
    try:
        src = f"{root}/src"
        (synth(spark, n_stream, offset=n_base)
         .repartition(n_batches).write.parquet(src))
        n_batch_rows = n_stream // n_batches
        # the per-leg row-modulo check below assumes exactly
        # equal-sized source files (round-robin repartition of an
        # evenly divisible count delivers that; verify, don't assume)
        per_file = (spark.read.parquet(src)
                    .groupBy(F.input_file_name()).count()
                    .select("count").distinct().collect())
        uniform = [r["count"] for r in per_file] == [n_batch_rows]

        def soak_kind(kind, path, ckpt, kills, append, rewrite, count):
            pending = list(kills)
            legs = 0
            t_all = time.time()
            while True:
                boom = pending[0] if pending else None

                def _fold(batch_df, batch_id, _boom=boom):
                    if _boom is not None and batch_id == _boom:
                        raise RuntimeError(
                            f"injected soak crash at batch {_boom}")
                    append(batch_df, batch_id)

                q = (_stream(spark, src).writeStream.foreachBatch(_fold)
                     .option("checkpointLocation", ckpt)
                     .trigger(availableNow=True).start())
                crashed = False
                try:
                    if not q.awaitTermination(1800):
                        q.stop()
                        raise AssertionError(f"{kind}: leg stalled")
                except AssertionError:
                    raise
                except Exception:
                    crashed = True
                legs += 1
                got = count()
                if crashed:
                    pending.pop(0)
                    # every recovery leg must leave a consistent table:
                    # whole committed batches only (nothing partial,
                    # nothing doubled)
                    extra = got - n_base
                    if uniform:
                        assert extra % n_batch_rows == 0, (kind, got)
                    assert 0 <= extra <= n_stream, (kind, got)
                    print(f"{kind}: leg {legs} crashed as scheduled "
                          f"(batch {boom}); committed so far exact: "
                          f"{got:,}")
                    if len(pending) == 1:
                        # mid-stream rewrite under the shared lease,
                        # checkpoint mid-source: last_epoch must carry
                        t = time.time()
                        rewrite()
                        print(f"{kind}: mid-stream rewrite "
                              f"{time.time()-t:6.1f}s (checkpoint "
                              "mid-source)")
                        after = count()
                        assert after == got, \
                            f"{kind}: rewrite changed rows {got}->{after}"
                else:
                    assert got == n_base + n_stream, (kind, got)
                    print(f"{kind}: drained after {legs} legs "
                          f"({len(kills)} kills) {time.time()-t_all:6.1f}s"
                          f"; final count exact: {got:,}")
                    return

        # -------- bucketed --------
        p = f"{root}/bkt"
        B.save_bucketed(synth(spark, n_base), p, key="k",
                        n_buckets=nb, table="t_soak")
        def count_bucketed():
            # the soak folds via append_bucketed directly (the kill
            # injection needs its own foreachBatch), so refresh the
            # driver session's cached file index the way the real twin
            # (stream_append_bucketed) does after each commit
            spark.catalog.refreshTable("t_soak")
            return spark.table("t_soak").count()

        soak_kind(
            "bucketed", p, f"{root}/ckpt_b", kills_b,
            lambda df, bid: B.append_bucketed(df, p, epoch_id=bid),
            lambda: B.rebucket(spark, p),
            count_bucketed)
        # post-soak: pruning must have survived the whole run
        B.force_bucketed_scan(spark, True)
        try:
            lookup = spark.table("t_soak").where(F.col("k") == 12345)
            m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)",
                          _plan(lookup))
            assert m and int(m.group(1)) == 1, "pruning lost post-soak"
            print(f"bucketed: post-soak pruning {m.group(0)}")
        finally:
            B.force_bucketed_scan(spark, False)

        # -------- clustered --------
        pc = f"{root}/clu"
        C.save_clustered(synth(spark, n_base), pc, ["v"], n_files=64)
        soak_kind(
            "clustered", pc, f"{root}/ckpt_c", kills_c,
            lambda df, bid: C.append_clustered(df, pc, epoch_id=bid),
            lambda: C.recluster(spark, pc),
            lambda: spark.read.parquet(pc).count())
        print("SOAK OK")
    finally:
        spark.sql("DROP TABLE IF EXISTS t_soak")
        _sh.rmtree(root, ignore_errors=True)


def run_dual(spark, fsio, B, C, n_base, n_stream, n_batches):
    """Dual-writer contention soak (VERDICT r13 next #4): TWO live
    availableNow streams over the SAME source with SEPARATE checkpoints
    race one bucketed table — the duplicate-run shape the lease contract
    had not been tested against.  Both streams see the identical file
    listing, so batch i carries the same rows for both; the table's
    maintain lease serializes the two folds (the loser's
    ConcurrentWriterError is retried with backoff — the retry either
    wins the lease or, once its twin committed the epoch, skips at the
    fence).  Asserted: exactly ONE committed batch per epoch across
    both writers, both streams drain without failing, the final count
    is exact, and a third fresh-checkpoint replay commits ZERO
    batches."""
    import shutil as _sh
    import threading

    root = tempfile.mkdtemp(prefix="sing_dual_")
    nb = 64
    try:
        src = f"{root}/src"
        (synth(spark, n_stream, offset=n_base)
         .repartition(n_batches).write.parquet(src))

        def race(kind, append, count, ckpt_prefix):
            commits = {}       # epoch -> [writer names that committed]
            retries = {"n": 0}   # lease-contention losses observed
            mu = threading.Lock()

            def fold_for(writer):
                def _fold(batch_df, batch_id):
                    from gqlite_spark.fsio import ConcurrentWriterError
                    # deterministic per-(writer, epoch) pacing jitter
                    # so LEADERSHIP ALTERNATES between the writers
                    # across the drain — without it one stream stays
                    # uniformly ahead and the other only ever exercises
                    # the skip path, never the lease race (plain
                    # arithmetic, not hash(): string hashing is salted
                    # per process)
                    phase = 0 if writer == "A" else 2
                    time.sleep(((batch_id + phase) % 4) * 0.15)
                    for attempt in range(600):
                        try:
                            done = append(batch_df, batch_id)
                            break
                        except ConcurrentWriterError:
                            with mu:
                                retries["n"] += 1
                            time.sleep(0.05 * min(attempt + 1, 10))
                    else:
                        raise AssertionError(
                            f"{kind}/{writer}: starved of the lease at "
                            f"epoch {batch_id}")
                    if done:
                        with mu:
                            commits.setdefault(batch_id, []).append(
                                writer)
                return _fold

            def run_stream(writer, ckpt, errs):
                try:
                    q = (_stream(spark, src).writeStream
                         .foreachBatch(fold_for(writer))
                         .option("checkpointLocation", ckpt)
                         .trigger(availableNow=True).start())
                    if not q.awaitTermination(1800):
                        q.stop()
                        raise AssertionError(f"{kind}/{writer}: stalled")
                except Exception as e:
                    errs.append((writer, e))

            t0 = time.time()
            errs = []
            ta = threading.Thread(target=run_stream,
                                  args=("A", f"{ckpt_prefix}_a", errs))
            tb = threading.Thread(target=run_stream,
                                  args=("B", f"{ckpt_prefix}_b", errs))
            ta.start(); tb.start()
            ta.join(1800); tb.join(1800)
            assert not errs, errs
            wall = time.time() - t0

            # exactly ONE commit per epoch across both writers
            assert sorted(commits) == list(range(n_batches)), \
                sorted(commits)
            doubled = {e: ws for e, ws in commits.items()
                       if len(ws) != 1}
            assert not doubled, f"double-committed epochs: {doubled}"
            by_writer = {"A": 0, "B": 0}
            for ws in commits.values():
                by_writer[ws[0]] += 1
            # zero lost / duplicated rows
            got = count()
            assert got == n_base + n_stream, (got, n_base + n_stream)
            print(f"dual/{kind}: both drained in {wall:6.1f}s; "
                  f"{n_batches} epochs committed once each "
                  f"(A={by_writer['A']}, B={by_writer['B']}, "
                  f"lease contentions retried={retries['n']}); "
                  f"count exact: {got:,}")
            # the race must actually have been exercised: both writers
            # won some epochs (jitter alternates leadership)
            assert by_writer["A"] > 0 and by_writer["B"] > 0, by_writer

            # a third fresh-checkpoint replay re-delivers every batch
            # and must commit NONE of them
            commits.clear()
            errs = []
            run_stream("C", f"{ckpt_prefix}_c", errs)
            assert not errs, errs
            assert commits == {}, f"replay committed: {commits}"
            assert count() == n_base + n_stream
            print(f"dual/{kind}: fresh-checkpoint replay committed 0 "
                  "batches; count unchanged")

        # -------- bucketed --------
        p = f"{root}/bkt"
        B.save_bucketed(synth(spark, n_base), p, key="k",
                        n_buckets=nb, table="t_dual")

        def count_bucketed():
            spark.catalog.refreshTable("t_dual")
            return spark.table("t_dual").count()

        race("bucketed",
             lambda df, bid: B.append_bucketed(df, p, epoch_id=bid),
             count_bucketed, f"{root}/ckb")

        # -------- clustered (same guarded_append protocol, its own
        # -------- lease kind; symmetric coverage of the shared path)
        pc = f"{root}/clu"
        C.save_clustered(synth(spark, n_base), pc, ["v"], n_files=64)
        race("clustered",
             lambda df, bid: C.append_clustered(df, pc, epoch_id=bid),
             lambda: spark.read.parquet(pc).count(), f"{root}/ckc")
        print("DUAL OK")
    finally:
        spark.sql("DROP TABLE IF EXISTS t_dual")
        _sh.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
