"""ANN recall probe (VERDICT r4 #4): measure recall@10 of every ANN
strategy against brute-force ground truth at the million-vector scale the
unit fixtures can't reach.  Correctness of the *candidate sets* is already
oracle-checked (tools/oracle_check.py); this measures RETRIEVAL QUALITY of
the deterministic sampling quantizers on a realistic distribution, with
and without Lloyd refinement — the reference's HNSW recall test
(/root/reference/test/query.cpp:13-59) is the parity anchor.

Corpus: n pseudo-random 16-d vectors (xxhash-uniform per dim, cluster
structure from a hashed center per id-block so IVF/PQ have geometry to
exploit).  Queries: perturbed corpus vectors (planted nearest neighbor)
plus uniform probes.  Ground truth: exact cosine top-10 per query.

Usage: python tools/recall_probe.py [n_vecs] [n_queries] [lsh|ivf|pq ...]
Results table is committed to PLANS.md.  The exact ground truth is cached
per (n_vecs, n_queries) under /tmp so the strategy families can run as
separate invocations (each family alone fits a CI time slot).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIM = 16


def main() -> None:
    n_vecs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    families = set(sys.argv[3:]) or {"lsh", "ivf", "pq"}

    from pyspark.sql import functions as F

    from gqlite_spark.operators.similarity import (ann_topk, cosine_topk,
                                                   ivf_centroids, ivf_topk,
                                                   lloyd_refine,
                                                   pq_codebooks, pq_topk)
    from gqlite_spark.session import get_spark

    spark = get_spark(app_name="recall-probe")
    spark.sparkContext.setLogLevel("ERROR")

    # clustered corpus: 64 hash-derived cluster centers, per-vector noise —
    # uniform-cube data has no structure for a coarse quantizer to learn;
    # clustered data is the realistic embedding shape
    cluster = F.col("id") % 64
    vec = F.transform(
        F.sequence(F.lit(1), F.lit(DIM)),
        lambda i: (F.pmod(F.xxhash64(cluster, i), F.lit(1000)) / 1000.0
                   + (F.pmod(F.xxhash64("id", i), F.lit(1000)) / 1000.0
                      - 0.5) * 0.2))
    corpus = (spark.range(n_vecs)
              .select(F.col("id").alias("vec_id"), vec.alias("embedding"))
              .persist())
    corpus.count()

    # queries: perturbed corpus vectors (odd) + cluster centers (even)
    qrows = corpus.filter(F.col("vec_id") % (n_vecs // n_queries) == 17) \
        .limit(n_queries).collect()
    queries = [[x + 0.003 * ((i * 7 + j) % 5 - 2) for j, x in
                enumerate(r["embedding"])] for i, r in enumerate(qrows)]

    cache = f"/tmp/recall_truth_{n_vecs}_{n_queries}.json"
    if os.path.exists(cache):
        truth = [set(t) for t in json.load(open(cache))]
        print(f"ground truth loaded from {cache}")
    else:
        t = time.time()
        truth = [set(r["id"] for r in
                     cosine_topk(corpus, q, k=10).collect())
                 for q in queries]
        json.dump([sorted(s) for s in truth], open(cache, "w"))
        print(f"ground truth ({n_queries} exact scans over {n_vecs:,}): "
              f"{time.time()-t:.1f}s -> {cache}")

    def recall(fn) -> tuple[float, float]:
        t0, hits = time.time(), 0
        for q, tru in zip(queries, truth):
            got = set(r["id"] for r in fn(q).collect())
            hits += len(got & tru)
        return hits / (10 * n_queries), (time.time() - t0) / n_queries

    results = []

    # -- LSH (the ann_topk path; knn_auto's above-threshold choice) -----
    if "lsh" in families:
        for planes, tables in ((8, 2), (6, 4)):
            r, s = recall(lambda q: ann_topk(corpus, q, dim=DIM, k=10,
                                             n_planes=planes,
                                             n_tables=tables))
            results.append((f"lsh planes={planes} tables={tables}", r, s))
            print(results[-1])

    # -- IVF: sampling quantizer vs lloyd-refined, nprobe sweep ---------
    if "ivf" in families:
        t = time.time()
        cents0 = ivf_centroids(corpus, nlist=64)
        print(f"ivf sampling centroids: {time.time()-t:.1f}s")
        t = time.time()
        cents2 = lloyd_refine(corpus, cents0, iters=2)
        print(f"lloyd_refine(2 iters over {n_vecs:,}): {time.time()-t:.1f}s")
        for label, cents in (("sampling", cents0), ("lloyd2", cents2)):
            for nprobe in (1, 4, 8):
                r, s = recall(lambda q: ivf_topk(corpus, q, cents,
                                                 nprobe=nprobe, k=10))
                results.append(
                    (f"ivf {label} nlist=64 nprobe={nprobe}", r, s))
                print(results[-1])

    # -- PQ: ADC ranking, candidates sweep ------------------------------
    if "pq" in families:
        t = time.time()
        books0 = pq_codebooks(corpus, m=4, ksub=16)
        print(f"pq sampling codebooks: {time.time()-t:.1f}s")
        for cand in (100, 1000, 5000):
            r, s = recall(lambda q: pq_topk(corpus, q, books0, k=10,
                                            candidates=cand))
            results.append((f"pq sampling m=4 ksub=16 cand={cand}", r, s))
            print(results[-1])

    print("\n| strategy | recall@10 | s/query |")
    print("|---|---|---|")
    for name, r, s in results:
        print(f"| {name} | {r:.2f} | {s:.2f} |")


if __name__ == "__main__":
    main()
