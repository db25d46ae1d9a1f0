"""Driver-gate dress rehearsal for the r9 contract candidates.

The r8 driver window is frozen (12 r8-new + 38 r6-stale), so the new
rollup / KMV operators ship without contract entries this round.
These tests run the EXACT entry-shaped queries against their DuckDB
oracles with the gate's own comparator (tools.oracle_check.compare),
so promoting them into __spark_entry__.queries()/oracle_sql() in r9 is
a copy-paste with proven parity.
"""

import sys

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from tools.oracle_check import compare, duck_con

sys.path.insert(0, "/root/repo")

K = 64
EVERY = 3600


def _md5_60bit(arg: str) -> str:
    """DuckDB replay of conv(substr(md5(x),1,15),16,10) — same helper
    form as __spark_entry__._md5_60bit."""
    terms = " + ".join(
        f"(strpos('0123456789abcdef', substr(md5({arg}), {i}, 1)) - 1)"
        f" * {16 ** (15 - i)}" for i in range(1, 16))
    return f"({terms})"


def test_rollup_incremental_candidate(spark, tmp_path):
    """Incremental rollup (build from 2/3 of events, append the rest)
    == the plain one-shot GROUP BY oracle: integer-cent sums make the
    mergeable path bit-exact cross-engine."""
    from gqlite_spark.operators.rollup import append_rollup, save_rollup
    ev = (spark.read.parquet(f"{SF_DIR}/events.parquet")
          .withColumn("v_cents",
                      F.floor(F.col("value") * 100 + F.lit(0.5))
                      .cast("long")))
    p = f"file:{tmp_path}/r9ru"
    save_rollup(ev.filter(F.col("event_id") % 3 != 0), p, "ts", EVERY,
                dims=["event_type"], metrics={"v_cents": ["sum", "max"]})
    append_rollup(ev.filter(F.col("event_id") % 3 == 0), p)
    got = (spark.read.parquet(p)
           .select("bucket_start", "event_type", "n",
                   F.col("sum_v_cents").alias("sum_cents"),
                   F.col("max_v_cents").alias("max_cents"))
           .toPandas())
    oracle = duck_con(SF_DIR).execute(f"""
        SELECT CAST(floor(date_part('epoch', ts) / {EVERY}) * {EVERY}
                    AS BIGINT) AS bucket_start,
               event_type,
               count(*) AS n,
               CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents,
               max(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS max_cents
        FROM events GROUP BY 1, 2
    """).fetchdf()
    verdict = compare(got, oracle)
    assert verdict.startswith("OK"), verdict


def test_distinct_kmv_candidate(spark):
    """Per-event-type KMV distinct-user estimate == the DuckDB replay
    of the estimator (min-k of the shared md5-60bit hashes, then
    (k-1)*2^60/h_k floor-half-up) — estimate values themselves match,
    not just the underlying data."""
    from gqlite_spark.operators.stats import kmv_estimate, kmv_sketch
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    got = kmv_estimate(
        kmv_sketch(ev, "user_id", k=K, by=["event_type"]),
        k=K, by=["event_type"]).toPandas()
    oracle = duck_con(SF_DIR).execute(f"""
        WITH d AS (
          SELECT DISTINCT event_type,
                 {_md5_60bit("CAST(user_id AS VARCHAR)")} AS h
          FROM events WHERE user_id IS NOT NULL
        ), r AS (
          SELECT event_type, h,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY h) AS rn
          FROM d
        ), s AS (SELECT * FROM r WHERE rn <= {K})
        SELECT event_type,
               CASE WHEN count(*) < {K} THEN count(*)
                    ELSE CAST(floor(({K} - 1) * 1152921504606846976.0
                                    / max(h) + 0.5) AS BIGINT)
               END AS n_distinct_est
        FROM s GROUP BY event_type
    """).fetchdf()
    verdict = compare(got, oracle)
    assert verdict.startswith("OK"), verdict
