"""Measure the incremental-rollup claim: folding a batch in costs the
batch, not the history.

Synthesizes an N-row event history (epoch-second ts over ~46 days,
8 event types, double value), builds the hourly rollup once, then
appends a batch of N/50 events and compares:

- full-build wall (scans N rows) vs append wall (scans N/50 rows plus
  the ~1,100-bucket-row table + swap);
- a NON-incremental strawman: what re-running the full build after the
  batch would cost (scan N + N/50) — the cost append avoids;
- correctness: merged rollup == one-shot rollup of history+batch.

At 100 TB the history scan is hours of cluster time; the bucket table
stays KB-to-GB-sized, so append cost is the ingest batch alone.

Run:  python tools/rollup_probe.py [n_events]
"""
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession, functions as F


def synth(spark, n, offset=0):
    return spark.range(n).select(
        (F.col("id") + offset).alias("event_id"),
        F.timestamp_seconds(
            F.pmod(F.xxhash64(F.col("id") + offset), F.lit(4_000_000))
        ).alias("ts"),
        F.concat(F.lit("t"), F.pmod(F.xxhash64(F.col("id") + offset + 3),
                                    F.lit(8))).alias("event_type"),
        (F.pmod(F.xxhash64(F.col("id") + offset + 7), F.lit(100_000))
         / 100.0).alias("value"))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000_000
    n_batch = int(sys.argv[2]) if len(sys.argv) > 2 else n // 50
    spark = (SparkSession.builder.master("local[16]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "8g")
             .appName("rollup_probe").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from gqlite_spark.operators.rollup import (append_rollup, read_rollup,
                                               save_rollup)

    root = tempfile.mkdtemp(prefix="rollup_probe_")
    metrics = {"value": ["sum", "min", "max"]}
    try:
        hist = synth(spark, n)
        batch = synth(spark, n_batch, offset=n)

        t = time.time()
        save_rollup(hist, f"{root}/ru", "ts", 3600,
                    dims=["event_type"], metrics=metrics)
        t_build = time.time() - t
        n_buckets = read_rollup(spark, f"{root}/ru").count()

        t = time.time()
        append_rollup(batch, f"{root}/ru")
        t_append = time.time() - t

        t = time.time()
        save_rollup(hist.unionByName(batch), f"{root}/full", "ts", 3600,
                    dims=["event_type"], metrics=metrics)
        t_rebuild = time.time() - t

        inc = read_rollup(spark, f"{root}/ru")
        full = read_rollup(spark, f"{root}/full")
        key = ["bucket_start", "event_type"]
        diff = (inc.select(*key, "n", F.round("sum_value", 4).alias("s"))
                .exceptAll(full.select(*key, "n", F.round("sum_value", 4).alias("s"))).count()
                + full.select(*key, "n", F.round("sum_value", 4).alias("s"))
                .exceptAll(inc.select(*key, "n", F.round("sum_value", 4).alias("s"))).count())

        print(f"history={n:,} events, batch={n_batch:,}, "
              f"buckets={n_buckets:,}")
        print(f"initial build: {t_build:.1f}s   append: {t_append:.1f}s   "
              f"full rebuild (what append avoids): {t_rebuild:.1f}s")
        print(f"append/rebuild cost ratio: {t_append / t_rebuild:.2f}")
        print(f"incremental == one-shot rollup: "
              f"{'YES' if diff == 0 else f'NO ({diff} differing rows)'}")
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()


def sketch_overhead(n=50_000_000):
    """What the sketch metrics add to a rollup build: scalar-only vs
    +kmv vs +kmv+hist at n events.  Run via:
    python -c "import sys; sys.path.insert(0,'/root/repo'); \
from tools.rollup_probe import sketch_overhead; sketch_overhead()"
    """
    import shutil
    import tempfile
    import time

    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[16]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "8g")
             .appName("rollup_sketch_probe").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from gqlite_spark.operators.rollup import save_rollup
    root = tempfile.mkdtemp(prefix="rusk_")
    try:
        ev = synth(spark, n).withColumn(
            "user", (F.xxhash64("event_id") % 1_000_000))
        cases = [
            ("scalar", {"value": ["sum", "min", "max"]}, None),
            ("+kmv", {"value": ["sum"], "user": ["kmv"]}, None),
            ("+kmv+hist", {"value": ["sum", "hist"], "user": ["kmv"]},
             {"value": (0.0, 1000.0, 256)}),
        ]
        for name, m, hp in cases:
            t = time.time()
            save_rollup(ev, f"{root}/{name}", "ts", 3600,
                        dims=["event_type"], metrics=m, hist_params=hp)
            print(f"{name:10s} build: {time.time()-t:.1f}s")
    finally:
        shutil.rmtree(root, ignore_errors=True)
