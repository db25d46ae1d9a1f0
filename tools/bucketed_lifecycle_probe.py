"""Measure the bucketed-layout lifecycle claims at probe scale
(VERDICT r10 next #6): the sf-scale tests prove correctness; this
measures the SCALING SHAPE the 100 TB story depends on:

1. append cost tracks the BATCH, not the table — a fixed-size batch
   appended to a 10 M-row table and a 50 M-row table should cost the
   same (hash-route one narrow shuffle of the batch; insertInto writes
   ≤ n_buckets files), and batch walls should grow ~linearly in batch
   size;
2. bucket pruning survives N appends — a point lookup still reads
   1/n_buckets of the FILES (SelectedBucketsCount in the plan) after
   every append, with wall growing only with the per-bucket file count
   (until a rebucket restores one file per bucket);
3. rebucket cost tracks the TABLE (it is the scheduled full rewrite —
   the thing appends let you amortize);
4. the overlay fold (Group.compact_into_layout) tracks the OVERLAY —
   folding 1 k / 10 k / 100 k upserts into a 10 M-row attached layout
   should scale with the overlay (probe + batch route), not the table.

Run:  python tools/bucketed_lifecycle_probe.py [n_small] [n_big]
Defaults 10 M / 50 M.  Results recorded in PLANS.md.
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


def main():
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_big = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000_000
    spark = (SparkSession.builder.master("local[16]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "8g")
             .appName("bucketed_lifecycle_probe").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from gqlite_spark.sources import bucketed as B

    root = tempfile.mkdtemp(prefix="bkt_probe_")
    nb = 64
    try:
        # -------- builds
        for tag, n in (("small", n_small), ("big", n_big)):
            t = time.time()
            B.save_bucketed(synth(spark, n), f"{root}/{tag}", key="k",
                            n_buckets=nb, table=f"t_{tag}")
            print(f"save_bucketed {tag:6} n={n:>11,}  "
                  f"{time.time() - t:6.1f}s")

        # -------- 1. append: fixed batch vs table size; batch scaling
        fixed = 500_000
        for tag, n in (("small", n_small), ("big", n_big)):
            t = time.time()
            B.append_bucketed(synth(spark, fixed, offset=n),
                              f"{root}/{tag}")
            print(f"append fixed {fixed:,} onto {tag:6} "
                  f"(n={n:>11,})  {time.time() - t:6.1f}s")
        for batch in (1_000_000, 5_000_000):
            t = time.time()
            B.append_bucketed(synth(spark, batch, offset=2 * n_big),
                              f"{root}/big")
            print(f"append batch={batch:>10,} onto big          "
                  f"{time.time() - t:6.1f}s")

        # -------- 2. pruning survival + point-lookup wall vs appends
        B.force_bucketed_scan(spark, True)
        try:
            for label in ("after 3 appends",):
                q = spark.table("t_big").where(f"k = {n_big // 2}")
                m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)",
                              _plan(q))
                t = time.time()
                q.collect()
                print(f"point lookup {label}: buckets {m.group(1)}/"
                      f"{m.group(2)}  {time.time() - t:6.2f}s")
        finally:
            B.force_bucketed_scan(spark, False)

        # -------- 3. rebucket tracks the table
        for tag, n in (("small", n_small), ("big", n_big)):
            t = time.time()
            B.rebucket(spark, f"{root}/{tag}")
            print(f"rebucket {tag:6} (n~{n:>11,})  "
                  f"{time.time() - t:6.1f}s")
        B.force_bucketed_scan(spark, True)
        try:
            q = spark.table("t_big").where(f"k = {n_big // 2}")
            t = time.time()
            q.collect()
            print(f"point lookup after rebucket:  {time.time() - t:6.2f}s")
        finally:
            B.force_bucketed_scan(spark, False)

        # -------- 4. fold tracks the overlay
        from gqlite_spark import GQLite
        db = GQLite(spark)
        g = db.catalog.create_graph("probe")
        grp = g.create_group("t")
        grp.register_df(synth(spark, n_small).withColumnRenamed("k", "id"),
                        key_col="id")
        p = f"{root}/fold"
        r = db.exec("{layout: 't', in: 'probe', path: '" + p +
                    "', bucket_by: 'id', buckets: 64, attach: true};")[0]
        assert r.error is None, r.error
        base = 3 * n_big
        for overlay in (1_000, 10_000, 100_000):
            for i in range(base, base + overlay):
                grp.upsert_vertex(i, {"d": i % 1000, "v": 0.5})
            base += overlay
            t = time.time()
            rep = grp.compact_into_layout()
            print(f"fold overlay={overlay:>8,} into n={n_small:,}  "
                  f"{time.time() - t:6.1f}s  {rep}")
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
