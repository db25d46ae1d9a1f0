"""Driver-gate dress rehearsal for the r10 contract candidates.

The r9 driver window is frozen (3 r9-new + 47 r7-stale; the deferred
trio filter_or / filter_datetime / projection goes first in r10), so
the r9-new layout-attach and rollup-cascade surfaces ship without their
own contract entries this round.  These tests run EXACT entry-shaped
queries against full DuckDB oracles with the gate's own comparator
(tools.oracle_check.compare), so promoting them into
__spark_entry__.queries()/oracle_sql() in r10 is a copy-paste with
proven parity.
"""

import sys

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from tools.oracle_check import compare, duck_con

sys.path.insert(0, "/root/repo")


def test_layout_attach_scan_candidate(spark, tmp_path):
    """Entry shape `layout_attach_scan`: export lineitem range-
    clustered on l_quantity, ATTACH it into the GQL query path, and
    run a GQL range query — the oracle is the plain predicate SQL, so
    parity proves the attached copy is faithful AND the routed scan
    returns exactly the group's rows (the attach machinery, oracled
    end-to-end)."""
    from gqlite_spark import GQLite
    db = GQLite(spark)
    g = db.catalog.create_graph("r10lay")
    grp = g.create_group("lineitem")
    grp.register_df(
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .withColumn("_rid", F.monotonically_increasing_id())
        .select(F.col("_rid").alias("lid"), "l_orderkey", "l_quantity",
                "l_extendedprice"),
        key_col="lid")
    p = str(tmp_path / "lay")
    r = db.exec("{layout: 'lineitem', in: 'r10lay', path: '" + p +
                "', by: 'l_quantity', files: 8, attach: true};")[0]
    assert r.error is None, r.error
    got = (db.query_df("{query: 'lineitem', in: 'r10lay',"
                       " where: {l_quantity: {$gt: 45}}};")
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


def test_rollup_coarsen_candidate(spark, tmp_path):
    """Entry shape `rollup_coarsen`: hourly rollup of events →
    coarsen_rollup to daily → read; oracle = the daily GROUP BY over
    the raw events (coarsening is exact for mergeable metrics)."""
    from gqlite_spark.operators.rollup import (coarsen_rollup,
                                               read_rollup, save_rollup)
    ev = (spark.read.parquet(f"{SF_DIR}/events.parquet")
          .withColumn("v_cents",
                      F.floor(F.col("value") * 100 + F.lit(0.5))
                      .cast("long")))
    ph = f"file:{tmp_path}/hr"
    pd_ = f"file:{tmp_path}/dy"
    save_rollup(ev, ph, "ts", 3600, dims=["event_type"],
                metrics={"v_cents": ["sum", "min", "max"]})
    coarsen_rollup(spark, ph, pd_, 86400)
    got = (read_rollup(spark, pd_)
           .select("bucket_start", "event_type", "n",
                   F.col("sum_v_cents").alias("sum_cents"),
                   F.col("min_v_cents").alias("min_cents"),
                   F.col("max_v_cents").alias("max_cents"))
           .toPandas())
    oracle = duck_con(SF_DIR).execute("""
        SELECT CAST(floor(date_part('epoch', ts) / 86400) * 86400
                    AS BIGINT) AS bucket_start,
               event_type, count(*) AS n,
               CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS sum_cents,
               min(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS min_cents,
               max(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS max_cents
        FROM events GROUP BY 1, 2
    """).fetchdf()
    verdict = compare(got, oracle)
    assert verdict.startswith("OK"), verdict


def _md5_60bit(arg: str) -> str:
    """DuckDB replay of conv(substr(md5(x),1,15),16,10)."""
    terms = " + ".join(
        f"(strpos('0123456789abcdef', substr(md5({arg}), {i}, 1)) - 1)"
        f" * {16 ** (15 - i)}" for i in range(1, 16))
    return f"({terms})"


def test_topcount_cms_candidate(spark):
    """Entry shape `topcount_cms`: per-event-type count-min estimates
    of five fixed user_ids (d=4, w=1024) — the oracle rebuilds the
    WHOLE sketch in SQL (md5-60bit row hashes mod w, counter sums, min
    over rows, 0 where absent), so the estimate VALUES must match."""
    from gqlite_spark.operators.stats import cms_query, cms_sketch
    D, W = 4, 1024
    KEYS = [1, 2, 3, 42, 999999]
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    keys = spark.createDataFrame([(k,) for k in KEYS], "key long")
    got = (cms_query(cms_sketch(ev, "user_id", D, W, by=["event_type"]),
                     keys, D, W, by=["event_type"])
           .toPandas())
    oracle = duck_con(SF_DIR).execute(f"""
        WITH rws AS (SELECT unnest(generate_series(0, {D - 1})) AS r),
        ks AS (SELECT CAST(unnest({KEYS}) AS BIGINT) AS key),
        ev AS (SELECT event_type, user_id FROM events
               WHERE user_id IS NOT NULL),
        cnt AS (
          SELECT event_type, r.r AS rw,
                 {_md5_60bit("CAST(user_id AS VARCHAR) || ':' || r.r")}
                   % {W} AS slot,
                 count(*) AS n
          FROM ev CROSS JOIN rws r GROUP BY 1, 2, 3),
        probe AS (
          SELECT g.event_type, k.key, r.r AS rw,
                 {_md5_60bit("CAST(k.key AS VARCHAR) || ':' || r.r")}
                   % {W} AS slot
          FROM (SELECT DISTINCT event_type FROM ev) g
          CROSS JOIN ks k CROSS JOIN rws r)
        SELECT p.event_type, p.key,
               min(coalesce(c.n, 0)) AS count_est
        FROM probe p LEFT JOIN cnt c
          ON c.event_type = p.event_type AND c.rw = p.rw
         AND c.slot = p.slot
        GROUP BY 1, 2
    """).fetchdf()
    verdict = compare(got, oracle)
    assert verdict.startswith("OK"), verdict
