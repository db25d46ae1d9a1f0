"""Throughput probe for the chained curation pipeline at scale.

Synthesizes N documents of ~40 words from a 64-word mixed-language
vocabulary (hash-derived, deterministic), with a 10% exact-duplicate
tail and a benchmark set = every 97th base document, then runs
sampling.curate_corpus (exact dedup → quality gate → 8-gram benchmark
decontamination → per-language report) as ONE plan and reports wall
time + docs/sec.

The pipeline's per-doc metrics are pure Column expressions, so the
bound is the two heavy exchanges: the dedup window on md5(text) and
the shingle-join aggregate.  docs/sec here extrapolates linearly to
executor count — there is no driver-side or single-reducer stage.

Run:  python tools/curation_probe.py [n_docs]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession, functions as F

VOCAB = ("the and of to in a is for on it that was with as his they at be "
         "this have from or had hot word but what some we can out other "
         "el la de que y en un ser se no le lo como mas pero sus "
         "le la et les des une dans est pour que qui sur pas plus par").split()


def synth_docs(spark, n):
    vocab = F.array(*[F.lit(w) for w in VOCAB])
    base = int(n * 0.9) or 1
    seed = (F.col("id") % base)          # last 10% duplicate earlier docs
    words = F.transform(
        F.sequence(F.lit(1), F.lit(40)),
        lambda i: F.element_at(
            vocab, (F.pmod(F.xxhash64(seed * 1000003 + i),
                           F.lit(len(VOCAB))) + 1).cast("int")))
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.array_join(words, " ").alias("text"),
        seed.alias("_seed"))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = (SparkSession.builder.master("local[16]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "8g")
             .appName("curation_probe").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from gqlite_spark.operators.sampling import curate_corpus

    docs = synth_docs(spark, n)
    bench = (docs.filter(F.col("_seed") % 97 == 0)
             .select("doc_id", "text"))
    train = (docs.filter(F.col("_seed") % 97 != 0)
             .select("doc_id", "text"))
    mode = sys.argv[2] if len(sys.argv) > 2 else "exact"
    for trial in range(3):
        t0 = time.time()
        if mode == "keep_best":
            # the r12 survivor chain: LSH pairs -> connected
            # components -> keep each cluster's longest member, then
            # the same one-plan pipeline purging to that verdict
            from gqlite_spark.operators.dedup import (
                keep_best_per_cluster, near_dup_clusters)
            clusters = near_dup_clusters(train)
            scores = train.select(
                "doc_id", F.length("text").cast("long").alias("score"))
            surv = keep_best_per_cluster(clusters, scores)
            out = curate_corpus(train, bench, survivors=surv).collect()
        else:
            out = curate_corpus(train, bench).collect()
        dt = time.time() - t0
        kept = sum(r["n_docs"] for r in out)
        print(f"trial{trial} [{mode}]: {dt:6.1f}s  {n/dt:,.0f} docs/s  "
              f"langs={len(out)} kept={kept:,}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
