"""Driver-gate dress rehearsal for the r12 contract candidates.

The r11 window is frozen (the 7 deferred entries + the 2 bucketed-
lifecycle promotions + 41 r9-stale entries), so the r11-new machinery
(streaming bucketed ingest, GQL sketch-read statements) ships without
its own contract rows this round.  These tests run EXACT entry-shaped
queries against full DuckDB oracles with the gate's own comparator
(tools.oracle_check.compare — dtype drift is a hard FAIL), so promoting
them into __spark_entry__.queries()/oracle_sql() in r12 is a copy-paste
with proven parity.
"""

import sys

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from tools.oracle_check import compare, duck_con

sys.path.insert(0, "/root/repo")


def test_stream_ingest_scan_candidate(spark, tmp_path):
    """Entry shape `stream_ingest_scan`: save 2/3 of lineitem bucketed
    on l_orderkey, STREAM the remaining 1/3 in as micro-batches
    (stream_append_bucketed, checkpointed foreachBatch -> epoch-guarded
    append_bucketed), then aggregate — the oracle is the plain GROUP BY
    over ALL of lineitem, so parity proves the continuous-ingest path
    is exactly-once end-to-end (nothing lost, doubled, or misrouted
    across micro-batches)."""
    from gqlite_spark.sources import bucketed as B
    from gqlite_spark.streaming.events import (stream_append_bucketed,
                                               stream_from_directory)
    li = (spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
          .select("l_orderkey", "l_quantity", "l_extendedprice"))
    p = str(tmp_path / "sing")
    B.save_bucketed(li.filter(F.col("l_orderkey") % 3 != 0), p,
                    key="l_orderkey", n_buckets=8, table="t_r12sing")
    src = str(tmp_path / "src")
    (li.filter(F.col("l_orderkey") % 3 == 0)
     .repartition(4)                      # several source files ->
     .write.parquet(src))                 # several micro-batches
    schema = ("l_orderkey bigint, l_quantity double,"
              " l_extendedprice double")
    q = stream_append_bucketed(
        stream_from_directory(spark, src, schema=schema, fmt="parquet"),
        p, checkpoint=str(tmp_path / "ckpt"))
    q.awaitTermination(180)
    got = (spark.table("t_r12sing")
           .groupBy("l_quantity")
           .agg(F.count("*").alias("n"),
                F.sum(F.round(F.col("l_extendedprice") * 100)
                      .cast("long")).alias("price_cents"))
           .toPandas())
    oracle = duck_con(SF_DIR).execute("""
        SELECT l_quantity, count(*) AS n,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS price_cents
        FROM lineitem GROUP BY l_quantity
    """).fetchdf()
    verdict = compare(got, oracle)
    assert verdict.startswith("OK"), verdict


def test_rollup_quantiles_read_candidate(spark, tmp_path):
    """Entry shape `rollup_quantiles_read`: build an hourly rollup of
    events with a hist metric on value ((0, 512, 64) binning), then
    serve per-(bucket, event_type) p50/p99 through the GQL
    {quantiles:} statement — the DuckDB oracle replays the ESTIMATOR
    itself (width_bucket binning, cumulative walk to the first bin
    covering rank q*total, linear interpolation inside it), so the
    estimate VALUES must match bit-for-bit, not just the inputs."""
    from gqlite_spark import GQLite
    from gqlite_spark.operators.rollup import save_rollup
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    p = str(tmp_path / "qru")
    save_rollup(ev, p, "ts", 3600, dims=["event_type"],
                metrics={"value": ["hist"]},
                hist_params={"value": (0.0, 512.0, 64)})
    db = GQLite(spark)
    got = db.query_df("{quantiles: '" + p +
                      "', on: 'value', qs: [0.5, 0.99]};").toPandas()
    oracle = duck_con(SF_DIR).execute("""
        WITH binned AS (
          SELECT CAST(floor(date_part('epoch', ts) / 3600) * 3600
                      AS BIGINT) AS bucket_start,
                 event_type,
                 LEAST(GREATEST(CAST(floor(value / 8.0) AS BIGINT) + 1,
                                1), 64) AS bin,
                 CAST(count(*) AS BIGINT) AS n
          FROM events WHERE value IS NOT NULL
          GROUP BY 1, 2, 3
        ), cum AS (
          SELECT *,
                 CAST(sum(n) OVER (PARTITION BY bucket_start, event_type
                                   ORDER BY bin) AS BIGINT) AS c,
                 CAST(sum(n) OVER (PARTITION BY bucket_start, event_type)
                      AS BIGINT) AS tot
          FROM binned
        ), hit AS (
          SELECT bucket_start, event_type, q, bin, n, c, tot,
                 row_number() OVER (PARTITION BY bucket_start,
                                    event_type, q
                                    ORDER BY bin) AS rn
          FROM cum, (VALUES (CAST(0.5 AS DOUBLE)),
                        (CAST(0.99 AS DOUBLE))) qs(q)
          WHERE c >= q * tot
        )
        SELECT bucket_start, event_type, q,
               0.0 + (bin - 1 + (q * tot - (c - n)) / n) * 8.0 AS value
        FROM hit WHERE rn = 1
    """).fetchdf()
    verdict = compare(got, oracle)
    assert verdict.startswith("OK"), verdict


def test_stream_clustered_scan_candidate(spark, tmp_path):
    """Entry shape `stream_clustered_scan`: save 2/3 of lineitem
    range-clustered on l_quantity, STREAM the remaining 1/3 in as
    sorted micro-batches (stream_append_clustered, checkpointed ->
    epoch-guarded append_clustered), `recluster` back to the
    write-time layout, then run a selective range aggregate — the
    oracle is the predicate GROUP BY over ALL of lineitem, so parity
    proves the clustered continuous-ingest path is exactly-once and
    the rewrite loses nothing."""
    from gqlite_spark.sources import clustered as C
    from gqlite_spark.streaming.events import (stream_append_clustered,
                                               stream_from_directory)
    li = (spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
          .select("l_orderkey", "l_quantity", "l_extendedprice"))
    p = str(tmp_path / "scl")
    C.save_clustered(li.filter(F.col("l_orderkey") % 3 != 0), p,
                     ["l_quantity"], n_files=8)
    src = str(tmp_path / "src")
    (li.filter(F.col("l_orderkey") % 3 == 0)
     .repartition(4).write.parquet(src))
    schema = ("l_orderkey bigint, l_quantity double,"
              " l_extendedprice double")
    q = stream_append_clustered(
        stream_from_directory(spark, src, schema=schema), p,
        checkpoint=str(tmp_path / "ckpt"))
    q.awaitTermination(180)
    C.recluster(spark, p)
    got = (spark.read.parquet(p)
           .where(F.col("l_quantity") > 45)
           .groupBy("l_quantity")
           .agg(F.count("*").alias("n"),
                F.sum(F.round(F.col("l_extendedprice") * 100)
                      .cast("long")).alias("price_cents"))
           .toPandas())
    oracle = duck_con(SF_DIR).execute("""
        SELECT l_quantity, count(*) AS n,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS price_cents
        FROM lineitem WHERE l_quantity > 45 GROUP BY l_quantity
    """).fetchdf()
    verdict = compare(got, oracle)
    assert verdict.startswith("OK"), verdict


def test_dedup_keep_best_candidate(spark):
    """Entry shape `dedup_keep_best`: near-dup clusters (LSH pairs ->
    connected components) with QUALITY survivor selection — each
    cluster keeps its longest member (tie -> min doc_id) instead of the
    arbitrary min-id canonical.  The oracle replays the whole chain:
    exact-Jaccard pair closure via recursive CTE, then argmax-by-length
    via row_number — so cluster membership AND the survivor choice are
    value-checked."""
    import __spark_entry__ as entry
    from gqlite_spark.operators.dedup import (keep_best_per_cluster,
                                              near_dup_clusters)
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    clusters = near_dup_clusters(d)
    scores = d.select("doc_id",
                      F.length("text").cast("long").alias("score"))
    got = keep_best_per_cluster(clusters, scores).toPandas()
    closure = entry.oracle_sql()["dedup_clusters"]
    # reuse the contract's pair-closure CTE, swap survivor selection
    prefix = closure[:closure.rindex("SELECT a AS doc_id")]
    oracle = duck_con(SF_DIR).execute(prefix.rstrip() + """,
        clus AS (SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_rep
                 FROM reach GROUP BY a),
        scored AS (SELECT c.doc_id, c.cluster_rep,
                          CAST(length(d.text) AS BIGINT) AS score
                   FROM clus c JOIN documents d ON d.doc_id = c.doc_id)
        SELECT doc_id, cluster_rep, score,
               row_number() OVER (PARTITION BY cluster_rep
                                  ORDER BY score DESC, doc_id ASC) = 1
               AS keep
        FROM scored
    """).fetchdf()
    verdict = compare(got, oracle)
    assert verdict.startswith("OK"), verdict
