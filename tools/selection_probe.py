"""Scale probe for the r14 selection/retrieval operators: BM25 top-k,
token-budget selection, and split assignment at 1M+ synthetic docs.

Reuses curation_probe's sparse corpus (Zipf-ish 50k-word vocabulary,
~40-word docs — the realistic training-data shape) and reports:

- ``bm25_topk``: wall + docs/sec for a 5-term query (4 mid-frequency
  terms + 1 rare).  The corpus is exploded twice (tf + df legs) but
  both legs filter to query terms before any shuffle, so the exchanges
  are query-sized; docs/sec extrapolates linearly to executor count.
- ``select_token_budget``: the histogram-threshold plan vs the NAIVE
  global-cumsum window (``SUM(tokens) OVER (ORDER BY q DESC, id)``)
  on the same frame — the naive form funnels every row through ONE
  partition; the decomposition's win is the point of the design and
  this probe records it as measured evidence, plus the histogram size
  (bounded by distinct quantized quality values) that makes the
  driver scan safe.
- ``split_assign``: wall for the pure-map carve (should track a bare
  scan — zero shuffle).

Run:  python tools/selection_probe.py [n_docs]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession, functions as F


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = (SparkSession.builder.master("local[16]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "24g")
             .config("spark.ui.enabled", "false")
             .appName("selection-probe").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from tools.curation_probe import synth_docs_sparse

    from gqlite_spark.operators.sampling import (select_token_budget,
                                                 split_assign)
    from gqlite_spark.operators.text import bm25_topk, quality_exprs

    docs = synth_docs_sparse(spark, n).select(
        "doc_id", "text", (F.pmod(F.xxhash64("doc_id"), F.lit(5000)))
        .alias("site"))
    docs.write.mode("overwrite").parquet("/tmp/selection_probe_docs")
    docs = spark.read.parquet("/tmp/selection_probe_docs")
    n_docs = docs.count()
    print(f"corpus: {n_docs} docs")

    # ---- BM25: pick 4 mid-frequency + 1 rare term from the corpus ----
    tf = (docs.select(F.explode(F.split("text", " ")).alias("t"))
          .groupBy("t").count().orderBy(F.desc("count")))
    terms_mid = [r["t"] for r in tf.limit(2000).collect()[1000:1004]]
    rare = tf.filter(F.col("count") < n_docs / 10_000).limit(1).collect()
    terms = terms_mid + ([rare[0]["t"]] if rare else [])
    for trial in range(2):
        t0 = time.time()
        out = bm25_topk(docs, terms, k=20)
        rows = out.count()
        w = time.time() - t0
        print(f"bm25_topk[{'cold' if trial == 0 else 'warm'}] "
              f"terms={terms} k=20 -> {rows} rows  wall {w:.2f}s  "
              f"{n_docs / w:,.0f} docs/s")

    # ---- token budget: decomposed vs naive global window ----
    # the sparse corpus is uniformly 40 words, so its derived quality
    # is a single value (histogram of 1 — the degenerate all-one-tie
    # case); give the probe the realistic shape instead: a quantized
    # 4-decimal score with up to 10^4 distinct values, the bound the
    # histogram-threshold plan is designed around
    e = quality_exprs(F.coalesce(F.col("text"), F.lit("")))
    scored = docs.select(
        "doc_id", e["n_tokens"].alias("n_tokens"),
        (F.round(F.pmod(F.xxhash64("doc_id"), F.lit(10_000))
                 / 10_000.0, 4)).alias("quality"))
    scored.write.mode("overwrite").parquet("/tmp/selection_probe_scored")
    scored = spark.read.parquet("/tmp/selection_probe_scored")
    total = scored.agg(F.sum("n_tokens")).collect()[0][0]
    budget = total // 5
    hist_n = scored.select("quality").distinct().count()
    for trial in range(2):
        t0 = time.time()
        sel = select_token_budget(scored, budget)
        rows = sel.count()
        w = time.time() - t0
        print(f"select_token_budget[{'cold' if trial == 0 else 'warm'}] "
              f"budget={budget} hist={hist_n} -> {rows} rows  "
              f"wall {w:.2f}s")
    from pyspark.sql import Window
    wspec = (Window.orderBy(F.col("quality").desc(),
                            F.col("doc_id").asc())
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    t0 = time.time()
    naive = (scored.withColumn("_cum", F.sum("n_tokens").over(wspec))
             .filter(F.col("_cum") <= budget))
    nrows = naive.count()
    w = time.time() - t0
    print(f"naive_global_cumsum -> {nrows} rows  wall {w:.2f}s  "
          "(single-partition ordered window — the shape the "
          "decomposition avoids)")

    # ---- split: pure map ----
    for trial in range(2):
        t0 = time.time()
        cnt = (split_assign(docs, key_col="site", salt="v1")
               .groupBy("split").count().collect())
        w = time.time() - t0
        print(f"split_assign[{'cold' if trial == 0 else 'warm'}] "
              f"{sorted((r['split'], r['count']) for r in cnt)}  "
              f"wall {w:.2f}s")
    t0 = time.time()
    docs.count()
    print(f"bare-scan floor: {time.time() - t0:.2f}s")


if __name__ == "__main__":
    main()
