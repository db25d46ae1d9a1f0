"""Driver-gate dress rehearsal for the r11 contract candidates.

The r10 window is frozen (the deferred trio + the red row + the three
r9-rehearsed promotions + 43 r8-stale entries), so the r10-new
bucketed-layout fold lifecycle ships without its own contract entry
this round.  This test runs an EXACT entry-shaped query against a full
DuckDB oracle with the gate's own comparator (tools.oracle_check.compare
— dtype drift is a hard FAIL since r10), so promoting it into
__spark_entry__.queries()/oracle_sql() in r11 is a copy-paste with
proven parity.
"""

import re
import sys

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from tools.oracle_check import compare, duck_con

sys.path.insert(0, "/root/repo")


def test_layout_fold_scan_candidate(spark, tmp_path):
    """Entry shape `layout_fold_scan`: export orders hash-bucketed on
    o_orderkey, ATTACH it, upsert 3 NEW rows + 1 UPDATE of an existing
    row, fold the overlay with {layout ... compact: true} (new ids
    route into their buckets, the update stays local under LWW), then
    run a selective GQL query spanning base + folded + updated rows.
    The oracle is the same relation in pure SQL (base minus the
    updated id, UNION ALL the literal upserts), so parity proves the
    fold is faithful end-to-end — the maintain-don't-re-export
    lifecycle that keeps bucket pruning alive across ingest at
    100 TB."""
    from gqlite_spark import GQLite
    db = GQLite(spark)
    g = db.catalog.create_graph("r11fold")
    grp = g.create_group("orders")
    grp.register_df(
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .select(F.col("o_orderkey").alias("id"), "o_custkey",
                "o_totalprice"),
        key_col="id")
    p = str(tmp_path / "fold")
    r = db.exec("{layout: 'orders', in: 'r11fold', path: '" + p +
                "', bucket_by: 'id', buckets: 8, attach: true};")[0]
    assert r.error is None, r.error
    for q in db.exec(
            "{upset: 'orders', in: 'r11fold', vertex: ["
            " [90000001, {o_custkey: 7, o_totalprice: 111.25}],"
            " [90000002, {o_custkey: 8, o_totalprice: 222.5}],"
            " [90000003, {o_custkey: 7, o_totalprice: 333.75}],"
            " [1, {o_custkey: 9999, o_totalprice: 1.5}]]};"):
        assert q.error is None, q.error
    r = db.exec("{layout: 'orders', in: 'r11fold', path: '" + p +
                "', compact: true};")[0]
    assert r.error is None and r.rows == [[3, 1]], r.error or r.rows
    q = db.query_df(
        "{query: 'orders', in: 'r11fold', where:"
        " {id: [1, 3, 90000001, 90000002, 90000003]}};")
    # the folded rows are served from the COPY with bucket pruning live
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"SelectedBucketsCount: \d+ out of 8", plan), plan
    got = q.toPandas()
    oracle = duck_con(SF_DIR).execute("""
        WITH t AS (
          SELECT o_orderkey AS id, o_custkey, o_totalprice
          FROM orders WHERE o_orderkey <> 1
          UNION ALL
          SELECT * FROM (VALUES
            (CAST(90000001 AS BIGINT), CAST(7 AS BIGINT), 111.25),
            (CAST(90000002 AS BIGINT), CAST(8 AS BIGINT), 222.5),
            (CAST(90000003 AS BIGINT), CAST(7 AS BIGINT), 333.75),
            (CAST(1 AS BIGINT), CAST(9999 AS BIGINT), 1.5))
            v(id, o_custkey, o_totalprice)
        )
        SELECT id, o_custkey, o_totalprice FROM t
        WHERE id IN (1, 3, 90000001, 90000002, 90000003)
    """).fetchdf()
    verdict = compare(got, oracle)
    assert verdict.startswith("OK"), verdict


def test_bucketed_append_rebucket_scan_candidate(spark, tmp_path):
    """Entry shape `bucketed_ingest_scan`: save 2/3 of lineitem
    bucketed on l_orderkey, `append_bucketed` the remaining 1/3 (the
    bucket-routed ingest batch), `rebucket` back to one file per
    bucket, then aggregate — the oracle is the plain GROUP BY over ALL
    of lineitem, so parity proves the whole ingest lifecycle is
    value-faithful (nothing lost, doubled, or misrouted across the
    append and the swap-atomic rewrite)."""
    from gqlite_spark.sources import bucketed as B
    li = (spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
          .select("l_orderkey", "l_quantity", "l_extendedprice"))
    p = str(tmp_path / "ing")
    B.save_bucketed(li.filter(F.col("l_orderkey") % 3 != 0), p,
                    key="l_orderkey", n_buckets=8, table="t_r11ing")
    B.append_bucketed(li.filter(F.col("l_orderkey") % 3 == 0), p)
    B.rebucket(spark, p)
    got = (spark.table("t_r11ing")
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
