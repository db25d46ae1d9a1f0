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

Run:  python tools/curation_probe.py [n_docs] [exact|keep_best] [dense|sparse]

Corpus shapes (VERDICT r12 next #6): the default 64-word vocabulary is
deliberately DENSE — every shingle is shared by thousands of docs, so
the LSH band join and the pair closure run under maximal pressure (the
conservative stress case).  `sparse` synthesizes the realistic
training-data shape instead: a heavy-tailed (Zipf-ish) 50k-word
vocabulary and a 20% near-duplicate tail (each dup copies a base doc
and mutates ~3 of its 40 words), so clusters are SMALL AND PLENTIFUL
and the shingle join is sparse.  keep_best trials on the sparse corpus
additionally report the pair/cluster statistics and the HashMin
closure's batch count (3 propagation steps per batch).
"""
import math
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


def synth_docs_sparse(spark, n, vocab_size=50_000, doc_len=40,
                      dup_frac=0.2):
    """Realistic-sparsity corpus (VERDICT r12 next #6): heavy-tailed
    vocabulary via the inverse-CDF Zipf trick (rank = floor(V^u) for
    uniform u gives p(rank) ~ 1/rank), so most words are common but the
    tail is long and most shingles are RARE — the sparse-join shape of
    real training data.  The last ``dup_frac`` of docs are NEAR-dups:
    each copies a uniformly chosen base doc and mutates ~3 of its 40
    words (per-position hash coin, rate 1/13), so clusters are small
    (2-4 members mostly) and plentiful, and some mutants legitimately
    fall below the 0.7 Jaccard cut — exactly the boundary the closure
    has to respect."""
    base = int(n * (1 - dup_frac)) or 1
    is_dup = F.col("id") >= base
    seed = (F.when(is_dup, F.pmod(F.xxhash64(F.col("id")), F.lit(base)))
            .otherwise(F.col("id")))
    ln_v = float(math.log(vocab_size))

    def zipf_word(h):
        u = (F.pmod(h, F.lit(1_000_000)) + F.lit(0.5)) / 1_000_000.0
        return F.concat(F.lit("w"),
                        F.floor(F.exp(u * ln_v)).cast("int"))

    words = F.transform(
        F.sequence(F.lit(1), F.lit(doc_len)),
        lambda i: F.when(
            is_dup & (F.pmod(F.xxhash64(F.col("id") * 31 + i),
                             F.lit(13)) == 0),
            zipf_word(F.xxhash64(F.col("id") * 7777 + i)))
        .otherwise(zipf_word(F.xxhash64(seed * 1000003 + i))))
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

    mode = sys.argv[2] if len(sys.argv) > 2 else "exact"
    corpus = sys.argv[3] if len(sys.argv) > 3 else "dense"
    docs = (synth_docs_sparse(spark, n) if corpus == "sparse"
            else synth_docs(spark, n))
    bench = (docs.filter(F.col("_seed") % 97 == 0)
             .select("doc_id", "text"))
    train = (docs.filter(F.col("_seed") % 97 != 0)
             .select("doc_id", "text"))
    for trial in range(3):
        t0 = time.time()
        if mode == "keep_best":
            # the r12 survivor chain: LSH pairs -> connected
            # components -> keep each cluster's longest member, then
            # the same one-plan pipeline purging to that verdict
            from gqlite_spark.operators import graph_algos as GA
            from gqlite_spark.operators.dedup import (
                keep_best_per_cluster, near_dup_clusters)
            # count the HashMin closure's checkpoint batches (3
            # propagation steps each) — the dense-vs-sparse iteration
            # comparison the probe exists to record
            batches = {"n": 0}
            orig_ckpt = GA._ckpt

            def counting(df):
                batches["n"] += 1
                return orig_ckpt(df)

            GA._ckpt = counting
            try:
                clusters = near_dup_clusters(train)
            finally:
                GA._ckpt = orig_ckpt
            scores = train.select(
                "doc_id", F.length("text").cast("long").alias("score"))
            surv = keep_best_per_cluster(clusters, scores)
            out = curate_corpus(train, bench, survivors=surv).collect()
        else:
            out = curate_corpus(train, bench).collect()
        dt = time.time() - t0
        kept = sum(r["n_docs"] for r in out)
        extra = ""
        if mode == "keep_best":
            extra = f" cc_batches={batches['n']}"
            if trial == 0:
                # cluster-shape statistics, once (outside the timer the
                # trials compare; recomputes the LSH chain)
                sz = clusters.groupBy("cluster_rep").count()
                row = sz.agg(
                    F.count("*").alias("k"), F.max("count").alias("mx"),
                    F.sum("count").alias("m")).first()
                extra += (f" clusters={row['k']:,} members={row['m']:,}"
                          f" max_cluster={row['mx']}")
        print(f"trial{trial} [{mode}/{corpus}]: {dt:6.1f}s  "
              f"{n/dt:,.0f} docs/s  langs={len(out)} kept={kept:,}"
              f"{extra}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
