"""Measure what bucketing buys a REPEATED large-fact join at scale.

The claim in sources/bucketed.py is that bucketing pays the join
shuffle once at write time: every later join (and bucket-key
aggregation) of the two tables runs with NO Exchange on either side.
This probe quantifies it on a 5M-order x 20M-lineitem pair (too big to
broadcast, uniform FK):

- write both sides plain parquet, time the fact-fact join + per-key
  aggregate warm (min of 3), count Exchange nodes in the final plan;
- write both sides bucketed on the join key (save_bucketed, one
  pre-shuffle each), time the same query via cobucket_join, assert the
  join+agg plan has ZERO Exchange;
- report the one-time extra write cost vs the per-join saving — the
  break-even is the number of joins after which bucketing is free.

Wall times at this scale are compressed by the page cache; the
scale-invariant facts are the Exchange counts (at 100 TB each Exchange
is a full network shuffle of the fact table) and the break-even ratio.

Run:  python tools/bucketed_join_probe.py [n_lineitem]
"""
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession, functions as F


def plan_str(df):
    return df._jdf.queryExecution().executedPlan().toString()


def timed(mk, reps=3):
    best = None
    for _ in range(reps):
        t = time.time()
        mk().collect()
        dt = time.time() - t
        best = dt if best is None else min(best, dt)
    return best


def main():
    n_li = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    n_ord = n_li // 4
    spark = (SparkSession.builder.master("local[16]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "8g")
             # the point is the big-big join: keep broadcast out of it
             .config("spark.sql.autoBroadcastJoinThreshold", "-1")
             .appName("bucketed_join_probe").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from gqlite_spark.sources.bucketed import attach_bucketed, save_bucketed

    root = tempfile.mkdtemp(prefix="bktjoin_")
    try:
        orders = spark.range(n_ord).select(
            F.col("id").alias("o_key"),
            F.pmod(F.xxhash64("id"), F.lit(1_000_000)).alias("o_cust"),
            (F.pmod(F.xxhash64(F.col("id") + 7), F.lit(10_000)) / 100.0)
            .alias("o_fee"))
        lineitem = spark.range(n_li).select(
            F.col("id").alias("l_id"),
            F.pmod(F.xxhash64(F.col("id") + 13), F.lit(n_ord))
            .alias("o_key"),
            (F.pmod(F.xxhash64(F.col("id") + 17), F.lit(50)) + 1)
            .alias("l_qty"),
            (F.pmod(F.xxhash64(F.col("id") + 23), F.lit(100_000)) / 100.0)
            .alias("l_price"))

        t = time.time()
        orders.write.parquet(f"{root}/ord_heap")
        lineitem.write.parquet(f"{root}/li_heap")
        w_heap = time.time() - t

        t = time.time()
        save_bucketed(orders, f"{root}/ord_bkt", "o_key", 32,
                      table="probe_ord")
        save_bucketed(lineitem, f"{root}/li_bkt", "o_key", 32,
                      table="probe_li")
        w_bkt = time.time() - t

        def q(o, li):
            rev = (li.join(o, "o_key")
                   .groupBy("o_key")
                   .agg(F.sum(F.col("l_qty") * F.col("l_price"))
                        .alias("rev"),
                        F.first("o_fee").alias("fee")))
            return rev.agg(F.count("*").alias("n"),
                           F.sum(F.col("rev") + F.col("fee")).alias("tot"))

        oh = spark.read.parquet(f"{root}/ord_heap")
        lh = spark.read.parquet(f"{root}/li_heap")
        heap_q = lambda: q(oh, lh)  # noqa: E731
        t_heap = timed(heap_q)
        heap_exch = plan_str(heap_q()).count("Exchange")

        ob = attach_bucketed(spark, f"{root}/ord_bkt")
        lb = attach_bucketed(spark, f"{root}/li_bkt")
        bkt_q = lambda: q(ob, lb)  # noqa: E731
        t_bkt = timed(bkt_q)
        p = plan_str(bkt_q())
        bkt_exch = p.count("Exchange")
        # the per-key join+agg must be exchange-free; only the final
        # 1-row rollup may shuffle
        per_key = (lb.join(ob, "o_key").groupBy("o_key")
                   .agg(F.sum("l_qty").alias("s")))
        per_key.collect()
        pk_exch = plan_str(per_key).count("Exchange")

        saving = t_heap - t_bkt
        extra_write = w_bkt - w_heap
        print(f"rows: orders={n_ord:,} lineitem={n_li:,}")
        print(f"write: heap {w_heap:.1f}s  bucketed {w_bkt:.1f}s "
              f"(extra {extra_write:.1f}s, one-time)")
        print(f"join+agg warm (min of 3): heap {t_heap:.2f}s "
              f"({heap_exch} Exchange)  bucketed {t_bkt:.2f}s "
              f"({bkt_exch} Exchange)")
        print(f"per-key join+agg Exchange count (bucketed): {pk_exch}")
        if saving > 0:
            print(f"break-even: {extra_write / saving:.1f} joins")
    finally:
        shutil.rmtree(root, ignore_errors=True)
        for tname in ("probe_ord", "probe_li"):
            spark.sql(f"DROP TABLE IF EXISTS `{tname}`")


if __name__ == "__main__":
    main()
