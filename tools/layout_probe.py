"""Measure what the storage layouts actually buy at scale.

Three layouts of the same N-row two-key fact table (keys uniform over
[0, 100k) x [0, 10k), plus 6 payload columns), each written once, then
a selective scan (predicate box covering ~1% of each key's range) and a
point lookup timed warm (min of 3) on each:

- heap      : plain parquet, no ordering — the baseline every row of
              which a selective scan must read;
- range(a)  : save_clustered on key a — perfect skipping on a, none on b;
- zorder    : save_clustered on (a, b) — file skipping on BOTH keys;
- bucket(a) : save_bucketed on a — bucket pruning for point lookups +
              exchange-free joins (join side not timed here; see
              tests/test_bucketed.py for the plan assertions).

Also prints the footer-stats overlap fraction per layout/key (the I/O
a pruned scan must read), which is the scale-invariant number: wall
times at 5M rows are compressed by page cache, but the overlap
fraction IS the fraction of a 100 TB table the same scan would read.

Run:  python tools/layout_probe.py [n_rows]
"""
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession, functions as F


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    spark = (SparkSession.builder.master("local[16]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "8g")
             .appName("layout_probe").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from gqlite_spark.sources import bucketed, clustered

    root = tempfile.mkdtemp(prefix="layout_probe_")
    base = spark.range(n).select(
        F.pmod(F.xxhash64("id"), F.lit(100_000)).alias("a"),
        F.pmod(F.xxhash64(F.col("id") + 1), F.lit(10_000)).alias("b"),
        *[F.pmod(F.xxhash64(F.col("id") + k), F.lit(1_000_000))
          .cast("double").alias(f"p{k}") for k in range(2, 8)])

    print(f"n={n}; writing layouts under {root}", flush=True)
    t0 = time.time()
    base.write.parquet(root + "/heap")
    t_heap = time.time() - t0
    t0 = time.time()
    clustered.save_clustered(spark.read.parquet(root + "/heap"),
                             root + "/range_a", ["a"], n_files=64)
    t_rng = time.time() - t0
    t0 = time.time()
    clustered.save_clustered(spark.read.parquet(root + "/heap"),
                             root + "/zorder", ["a", "b"], n_files=64)
    t_z = time.time() - t0
    t0 = time.time()
    bucketed.save_bucketed(spark.read.parquet(root + "/heap"),
                           root + "/bucket_a", "a", 64,
                           table="probe_bkt", sort=True)
    t_b = time.time() - t0
    print(f"write: heap {t_heap:.1f}s  range {t_rng:.1f}s  "
          f"zorder {t_z:.1f}s  bucket {t_b:.1f}s", flush=True)

    for name in ("heap", "range_a", "zorder"):
        for col in ("a", "b"):
            st = clustered.file_stats(root + "/" + name, col)
            lo, hi = (1000, 1999) if col == "a" else (100, 199)
            frac = clustered.overlap_fraction(st, lo, hi)
            print(f"overlap {name:8s} {col}: {frac:.3f} "
                  f"({len(st)} files)", flush=True)

    def timed(label, mk):
        ts = []
        for _ in range(3):
            t0 = time.time()
            mk().agg(F.count("*"), F.sum("p2")).collect()
            ts.append(time.time() - t0)
        print(f"  {label}: {min(ts):.2f}s", flush=True)

    print("selective box scan (1% of a-range x 1% of b-range):")
    box = ((F.col("a").between(1000, 1999))
           & (F.col("b").between(100, 199)))
    for name in ("heap", "range_a", "zorder"):
        timed(name, lambda name=name:
              spark.read.parquet(root + "/" + name).filter(box))

    print("point lookup (a = 4242):")
    for name in ("heap", "range_a", "zorder"):
        timed(name, lambda name=name:
              spark.read.parquet(root + "/" + name)
              .filter(F.col("a") == 4242))
    bucketed.force_bucketed_scan(spark, True)
    try:
        timed("bucket_a", lambda:
              spark.table("probe_bkt").filter(F.col("a") == 4242))
    finally:
        bucketed.force_bucketed_scan(spark, False)

    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
