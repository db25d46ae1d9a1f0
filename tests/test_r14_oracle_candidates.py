"""Driver-gate dress rehearsal for the r14 contract candidates.

The r13 window is frozen (the 12 two-round-stale entries + the 2
curation promotions + 36 r11-stale entries), so machinery that earns a
new oracle this round ships without its own contract row.  These tests
run EXACT entry-shaped queries against full DuckDB oracles with the
gate's own comparator (tools.oracle_check.compare — dtype drift is a
hard FAIL), so promoting them into __spark_entry__.queries() /
oracle_sql() in r14 is a copy-paste with proven parity.
"""

import sys

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from tools.oracle_check import compare, duck_con

sys.path.insert(0, "/root/repo")


def test_stream_upsert_scan_candidate(spark, tmp_path):
    """Entry shape `stream_upsert_scan`: the streaming -> graph LWW
    ingestion lifecycle (stream_upsert_vertices) driver-oracled end to
    end — the last uncontracted exactly-once streaming twin.  Events
    stream into a vertex group as checkpointed micro-batches with
    version_col='event_id' (a unique monotonic sequence), so the
    version-aware merge must leave exactly the GLOBAL max-version row
    per user regardless of how rows fall into micro-batches; the
    oracle is the plain argmax window over the raw table.  Parity
    proves the cross-batch re-reduce (old state UNION new batch ->
    max-version per key) is value-faithful — the continuous `upset`
    contract (reference intent: UpsetPlan.cpp:88-127) under streaming
    delivery."""
    from gqlite_spark.catalog import Graph
    from gqlite_spark.streaming.events import stream_upsert_vertices

    ev = (spark.read.parquet(f"{SF_DIR}/events.parquet")
          .filter(F.col("user_id").isNotNull())
          .select("user_id", "event_id", "event_type",
                  F.round(F.col("value") * 100).cast("long")
                  .alias("value_cents")))
    src = str(tmp_path / "src")
    ev.repartition(4).write.parquet(src)      # several micro-batches
    g = Graph(spark, "r14su").create_group("user")
    stream = (spark.readStream.format("parquet")
              .schema("user_id bigint, event_id bigint,"
                      " event_type string, value_cents bigint")
              .option("maxFilesPerTrigger", 1).load(src))
    q = stream_upsert_vertices(stream, g,
                               checkpoint=str(tmp_path / "ckpt"),
                               key_col="user_id",
                               version_col="event_id")
    assert q.awaitTermination(300)
    got = (g.to_df()
           .select(F.col("id").alias("user_id"), "event_id",
                   "event_type", "value_cents")).toPandas()

    oracle = duck_con(SF_DIR).execute(
        "SELECT user_id, event_id, event_type,"
        " CAST(ROUND(value * 100) AS BIGINT) AS value_cents"
        " FROM (SELECT *, row_number() OVER (PARTITION BY user_id"
        "       ORDER BY event_id DESC) AS rn"
        "       FROM events WHERE user_id IS NOT NULL) WHERE rn = 1"
    ).fetchdf()
    verdict = compare(got, oracle)
    assert verdict.startswith("OK"), verdict


def test_stream_rollup_scan_candidate(spark, tmp_path):
    """Entry shape `stream_rollup_scan`: the exactly-once ROLLUP
    streaming twin driver-oracled end to end — build the hourly rollup
    from 2/3 of events, STREAM the remaining 1/3 in as checkpointed
    micro-batches (stream_rollup: foreachBatch -> epoch-guarded
    append_rollup, only touched buckets rewritten under the crash-safe
    swap), read the stored table.  The oracle is rollup_incremental's
    proven SQL (the one-shot hourly GROUP BY over ALL events) —
    mergeability means streamed == one-shot exactly, and the epoch
    fence means replayed batches never double-count."""
    import __spark_entry__ as entry
    from gqlite_spark.operators.rollup import read_rollup, save_rollup
    from gqlite_spark.streaming.events import (stream_from_directory,
                                               stream_rollup)

    ev = (spark.read.parquet(f"{SF_DIR}/events.parquet")
          .withColumn("v_cents",
                      F.floor(F.col("value") * 100 + F.lit(0.5))
                      .cast("long")))
    p = f"file:{tmp_path}/sroll"
    save_rollup(ev.filter(F.col("event_id") % 3 != 0), p, "ts", 3600,
                dims=["event_type"], metrics={"v_cents": ["sum", "max"]})
    src = str(tmp_path / "src")
    (ev.filter(F.col("event_id") % 3 == 0)
     .select("ts", "event_type", "v_cents")
     .repartition(4).write.parquet(src))       # several micro-batches
    q = stream_rollup(
        stream_from_directory(
            spark, src,
            schema="ts timestamp, event_type string, v_cents bigint"),
        p, checkpoint=str(tmp_path / "ckpt"))
    assert q.awaitTermination(300)
    got = (read_rollup(spark, p)
           .select("bucket_start", "event_type", "n",
                   F.col("sum_v_cents").alias("sum_cents"),
                   F.col("max_v_cents").alias("max_cents"))).toPandas()

    oracle = duck_con(SF_DIR).execute(
        entry.oracle_sql()["rollup_incremental"]).fetchdf()
    verdict = compare(got, oracle)
    assert verdict.startswith("OK"), verdict


def test_gql_similar_topk_candidate(spark):
    """Entry shape `gql_similar_topk`: top-k vector search END-TO-END
    through the GQL `{similar:}` statement (parse -> validate -> lower
    onto operators/similarity.cosine_topk), against the PROVEN
    sim_cosine_topk oracle — the statement route's first gate row,
    mirroring what r13 did for `{curate:}`.  The query vector is
    embeddings.vec_id=0 formatted as a GQL float-list literal (repr
    round-trips float64 exactly, so the scores are bit-identical to
    the library path)."""
    import __spark_entry__ as entry
    from gqlite_spark import GQLite

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    db = GQLite(spark)
    g = db.catalog.create_graph("r14sim")
    g.create_group("vecs").register_df(emb, key_col="vec_id")
    qvec = [float(x) for x in
            emb.filter(F.col("vec_id") == 0)
            .select("embedding").collect()[0][0]]
    lit = "[" + ", ".join(repr(x) for x in qvec) + "]"
    got = (db.query_df("{similar: 'vecs', in: 'r14sim', to: " + lit +
                       ", top: 10, method: 'brute'};")
           .withColumnRenamed("id", "vec_id")).toPandas()

    oracle = duck_con(SF_DIR).execute(
        entry.oracle_sql()["sim_cosine_topk"]).fetchdf()
    verdict = compare(got, oracle)
    assert verdict.startswith("OK"), verdict
