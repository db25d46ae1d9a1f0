"""Measure the KMV distinct sketch at scale: accuracy, cost vs exact
count-distinct and vs Spark's HLL, and the merge path.

N rows whose values repeat ~4x (true distinct = N/4), then:

- exact countDistinct (the cost ceiling the sketch competes with);
- Spark approx_count_distinct (HLL, the built-in baseline — fast but
  non-deterministic across engines and unmergeable as rows);
- kmv_sketch + kmv_estimate at k in {256, 1024, 4096};
- the batch story: sketch two halves separately, kmv_merge, and check
  the merged estimate equals the whole-data sketch estimate exactly
  (determinism) — the "profile at ingest, merge forever" path.

Run:  python tools/kmv_probe.py [n_rows]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession, functions as F


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000
    spark = (SparkSession.builder.master("local[16]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "8g")
             .appName("kmv_probe").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from gqlite_spark.operators.stats import (kmv_estimate, kmv_merge,
                                              kmv_sketch)

    true_d = n // 4
    df = spark.range(n).select(
        F.pmod(F.xxhash64("id"), F.lit(true_d)).alias("v"))
    # materialize once so every contender reads the same cached input
    df = df.persist()
    df.count()

    t = time.time()
    exact = df.select(F.countDistinct("v")).collect()[0][0]
    t_exact = time.time() - t

    t = time.time()
    hll = df.select(F.approx_count_distinct("v")).collect()[0][0]
    t_hll = time.time() - t

    print(f"n={n:,} true_distinct={exact:,} "
          f"(exact {t_exact:.1f}s, hll {t_hll:.1f}s "
          f"err {abs(hll - exact) / exact:.2%})")
    for k in (256, 1024, 4096):
        for h in ("md5", "xx"):
            t = time.time()
            est = kmv_estimate(kmv_sketch(df, "v", k=k, hash=h),
                               k=k).collect()[0][0]
            dt = time.time() - t
            print(f"kmv k={k:>4} hash={h:>3}: est={est:,}  "
                  f"err={abs(est - exact) / exact:.2%}  {dt:.1f}s")

    # histogram sketch vs the built-in quantile estimator
    from gqlite_spark.operators.stats import hist_quantiles, hist_sketch
    t = time.time()
    pa = df.select(F.percentile_approx("v", [0.5, 0.99])).collect()[0][0]
    t_pa = time.time() - t
    t = time.time()
    hs = hist_sketch(df, "v", 0.0, float(true_d), 1024)
    hq = {r["q"]: r["value"] for r in
          hist_quantiles(hs, [0.5, 0.99], 0.0, float(true_d),
                         1024).collect()}
    t_hist = time.time() - t
    print(f"quantiles p50/p99: percentile_approx {t_pa:.1f}s "
          f"({pa[0]:,.0f}/{pa[1]:,.0f})  hist_sketch {t_hist:.1f}s "
          f"({hq[0.5]:,.0f}/{hq[0.99]:,.0f}; mergeable rows)")

    # per-group: 16 big groups — prefilter should bound the window sort
    gdf = df.withColumn("g", F.pmod(F.col("v"), F.lit(16)))
    for pf in (False, True):
        t = time.time()
        n_sk = kmv_sketch(gdf, "v", k=1024, by=["g"], hash="xx",
                          prefilter=pf).count()
        print(f"per-group k=1024 xx prefilter={pf}: {time.time()-t:.1f}s "
              f"({n_sk} sketch rows)")

    # the batch story: two halves (id parity) sketched independently
    half1 = spark.range(n).filter("id % 2 = 0").select(
        F.pmod(F.xxhash64("id"), F.lit(true_d)).alias("v"))
    half2 = spark.range(n).filter("id % 2 = 1").select(
        F.pmod(F.xxhash64("id"), F.lit(true_d)).alias("v"))
    k = 1024
    t = time.time()
    s1 = kmv_sketch(half1, "v", k=k).persist()
    s1.count()
    s2 = kmv_sketch(half2, "v", k=k).persist()
    s2.count()
    t_sketches = time.time() - t
    t = time.time()
    merged_est = kmv_estimate(kmv_merge([s1, s2], k=k), k=k).collect()[0][0]
    t_merge = time.time() - t
    whole_est = kmv_estimate(kmv_sketch(df, "v", k=k), k=k).collect()[0][0]
    print(f"merge path k={k}: per-half sketches {t_sketches:.1f}s, "
          f"merge+estimate {t_merge:.2f}s, merged est={merged_est:,} "
          f"({'==' if merged_est == whole_est else '!='} whole-data est)")


if __name__ == "__main__":
    main()
