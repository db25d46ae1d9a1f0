"""Colored-subgraph depth-distribution probe for the SCC peeling loop
(VERDICT r14 next #3's precondition: measure HOW DEEP each round's
min-label propagation actually runs before restructuring the batching).

Replays `_scc_impl`'s round structure with batch=1 probing (exact
convergence depth per direction per round) and reports, per round:
active vertex/edge counts, fwd/bwd depth, and the Spark job count the
real implementation would spend.  Also probes the CC loop depth for the
dedup pair graphs (dedup_keep_best / dedup_clusters inputs).

Usage:
    python tools/scc_probe.py [--sf-dir /root/testdata/sf0.001] [--cc]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def probe_depth(labels, ed, max_iter=64):
    """Exact supersteps until the min-label fixpoint (batch=1 probing)."""
    from gqlite_spark.operators.graph_algos import _ckpt_probe, _one_step_ref
    chg = F.sum(F.xxhash64("id", "color", "lab").cast("decimal(38,0)"))
    prev = None
    for it in range(max_iter):
        labels = _one_step_ref(labels, ed)
        labels, pr = _ckpt_probe(labels, chg)
        cur = pr[0]
        if prev is not None and cur == prev:
            return it, labels  # converged AFTER `it` steps (step it was a no-op)
        prev = cur
    return max_iter, labels


def main() -> None:
    argv = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    do_cc = "--cc" in argv
    for i, a in enumerate(argv):
        if a == "--sf-dir":
            sf_dir = argv[i + 1]

    from gqlite_spark.session import get_spark
    import __spark_entry__ as entry
    import gqlite_spark.operators.graph_algos as GA

    # expose _one_step outside _scc_impl for the probe
    def _one_step_ref(labels, ed):
        msgs = (labels.alias("l")
                .join(ed.alias("e"), F.col("l.id") == F.col("e.src"))
                .select(F.col("e.dst").alias("id"),
                        F.col("l.color").alias("color"),
                        F.col("l.lab").alias("lab")))
        msgs = (msgs.alias("m")
                .join(labels.select("id", "color").alias("t"),
                      ["id", "color"], "inner"))
        return (labels.unionByName(msgs.select("id", "color", "lab"))
                .groupBy("id", "color").agg(F.min("lab").alias("lab")))
    GA._one_step_ref = _one_step_ref

    spark = get_spark(app_name="gqlite-scc-probe")
    spark.sparkContext.setLogLevel("ERROR")

    # --- SCC rounds: the q_scc ring graph -----------------------------
    from pyspark.sql import Window
    n = entry._load(spark, sf_dir, "nation")
    w = Window.partitionBy("n_regionkey").orderBy("n_nationkey")
    first = n.groupBy("n_regionkey").agg(F.min("n_nationkey").alias("first_key"))
    chain = (n.select(F.col("n_regionkey"),
                      F.col("n_nationkey").cast("long").alias("src"),
                      F.lead("n_nationkey").over(w).cast("long").alias("dst")))
    closing = (chain.filter(F.col("dst").isNull())
               .join(first, "n_regionkey")
               .select("src", F.col("first_key").cast("long").alias("dst")))
    edges = (chain.filter(F.col("dst").isNotNull()).select("src", "dst")
             .unionByName(closing))

    with GA._iterative_shuffle_scope(edges):
        e = edges.select("src", "dst").filter(F.col("src") != F.col("dst")) \
                 .distinct().cache()
        verts = (e.select(F.col("src").alias("id"))
                 .unionByName(e.select(F.col("dst").alias("id"))).distinct())
        active = verts.withColumn("color", F.lit(0).cast("long"))
        rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        for rnd in range(16):
            n_active = active.count()
            n_edges = e.count()
            init = active.withColumn("lab", F.col("id"))
            t0 = time.time()
            df_fwd, fwd = probe_depth(init, e)
            t_f = time.time() - t0
            t0 = time.time()
            dbwd, bwd = probe_depth(init, rev)
            t_b = time.time() - t0
            fwdl = fwd.withColumnRenamed("lab", "fwd")
            bwdl = bwd.withColumnRenamed("lab", "bwd")
            both = fwdl.join(bwdl, ["id", "color"])
            remaining = both.filter(F.col("fwd") != F.col("bwd"))
            active = GA._ckpt(remaining.select(
                "id", F.xxhash64("color", "fwd", "bwd").alias("color")))
            n_rem = active.count()
            print(json.dumps({"probe": "scc_round", "round": rnd,
                              "active": n_active, "edges": n_edges,
                              "fwd_depth": df_fwd, "bwd_depth": dbwd,
                              "t_fwd": round(t_f, 2), "t_bwd": round(t_b, 2),
                              "remaining": n_rem}), flush=True)
            if n_rem == 0:
                break
            a1 = active.select(F.col("id").alias("src"),
                               F.col("color").alias("_sc"))
            a2 = active.select(F.col("id").alias("dst"),
                               F.col("color").alias("_dc"))
            e = GA._ckpt(e.join(a1, "src").join(a2, "dst")
                         .filter(F.col("_sc") == F.col("_dc"))
                         .select("src", "dst"))
            rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))

    if do_cc:
        # --- CC depth on the dedup pair graph (keep_best input) -------
        from gqlite_spark.operators.dedup import minhash_lsh_pairs
        from gqlite_spark.operators.ckpt import materialize
        docs = entry._load(spark, sf_dir, "documents")
        pairs = minhash_lsh_pairs(docs)
        ed = materialize(pairs.select(F.col("doc_a").alias("src"),
                                      F.col("doc_b").alias("dst")),
                         eager=True, coalesce=True)
        with GA._iterative_shuffle_scope(ed):
            e = GA.normalize_edges(ed, undirected=True) \
                  .select("src", "dst").distinct().cache()
            labels = (e.select(F.col("src").alias("id"))
                      .unionByName(e.select(F.col("dst").alias("id")))
                      .distinct().withColumn("component", F.col("id"))
                      .withColumn("color", F.lit(0))
                      .withColumnRenamed("component", "lab")
                      .select("id", "color", "lab"))
            n_edges = e.count()
            depth, _ = probe_depth(labels, e)
            print(json.dumps({"probe": "cc_keepbest_pairs",
                              "edges": n_edges, "depth": depth}),
                  flush=True)


if __name__ == "__main__":
    main()
