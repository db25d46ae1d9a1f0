"""Driver-gate dress rehearsal for the r15 contract candidates.

The r14 window is frozen (the 14 two-round-stale entries + the 3
streaming/{similar:} promotions + 33 r12-stale entries), so statement
routes that earn a gate row next ship without their own contract row
this round.  r14 put the FIRST gate row on a pipeline statement route
({similar:}); these rehearse the next three — {dedup:}, {funnel:} and
{sample:} end-to-end through GQL against the SAME proven oracles their
library-path twins already pass, with the gate's own comparator
(tools.oracle_check.compare — dtype drift is a hard FAIL).  Promoting
them into __spark_entry__.queries() / oracle_sql() in r15 is a
copy-paste with proven parity (contract -> 120).
"""

import sys

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from tools.oracle_check import compare, duck_con

sys.path.insert(0, "/root/repo")


def test_gql_dedup_clusters_candidate(spark):
    """Entry shape `gql_dedup_clusters`: transitive near-dup clusters
    END-TO-END through the GQL `{dedup: method: 'clusters'}` statement
    (parse -> validate -> lower onto operators/dedup.near_dup_clusters
    with the group's key as doc id), against the PROVEN dedup_clusters
    oracle (recursive-CTE closure over the exact-Jaccard pair set).
    threshold: 0.7 is passed explicitly — the statement default is 0.8,
    the library/oracle pair is proven at 0.7."""
    import __spark_entry__ as entry
    from gqlite_spark import GQLite

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    db = GQLite(spark)
    g = db.catalog.create_graph("r15dc")
    g.create_group("docs").register_df(d, key_col="doc_id")
    got = (db.query_df("{dedup: 'docs', in: 'r15dc',"
                       " method: 'clusters', threshold: 0.7};")
           .withColumnRenamed("id", "doc_id")).toPandas()

    oracle = duck_con(SF_DIR).execute(
        entry.oracle_sql()["dedup_clusters"]).fetchdf()
    verdict = compare(got, oracle)
    assert verdict.startswith("OK"), verdict


def test_gql_event_funnel_candidate(spark):
    """Entry shape `gql_event_funnel`: the view->click->purchase
    conversion funnel END-TO-END through the GQL `{funnel:}` statement
    (lowering onto operators/temporal.funnel — k filtered keyed
    aggregates, never a window over the raw stream), against the PROVEN
    event_funnel oracle.  The ts property rides the group's
    dual-encoding contract (timestamp-typed or long nanoseconds)."""
    import __spark_entry__ as entry
    from gqlite_spark import GQLite

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    db = GQLite(spark)
    g = db.catalog.create_graph("r15fn")
    g.create_group("ev").register_df(ev, key_col="event_id")
    got = db.query_df(
        "{funnel: 'ev', in: 'r15fn',"
        " steps: ['view', 'click', 'purchase'],"
        " by: 'user_id', on: 'event_type', ts: 'ts'};").toPandas()

    oracle = duck_con(SF_DIR).execute(
        entry.oracle_sql()["event_funnel"]).fetchdf()
    verdict = compare(got, oracle)
    assert verdict.startswith("OK"), verdict


def test_gql_sample_stratified_candidate(spark):
    """Entry shape `gql_sample_stratified`: deterministic per-language
    sampling END-TO-END through the GQL `{sample: by/rates/default}`
    statement (lowering onto operators/sampling.stratified_sample — the
    md5-prefix membership hashes the key VALUE, so the group's id
    rename does not move the sample), against the PROVEN
    sample_stratified oracle."""
    import __spark_entry__ as entry
    from gqlite_spark import GQLite

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    db = GQLite(spark)
    g = db.catalog.create_graph("r15ss")
    g.create_group("docs").register_df(d, key_col="doc_id")
    got = (db.query_df("{sample: 'docs', in: 'r15ss', by: 'lang',"
                       " rates: {en: 0.5, zh: 0.25}, default: 0.125};")
           .withColumnRenamed("id", "doc_id")
           .select("doc_id", "lang", "n_chars")).toPandas()

    oracle = duck_con(SF_DIR).execute(
        entry.oracle_sql()["sample_stratified"]).fetchdf()
    verdict = compare(got, oracle)
    assert verdict.startswith("OK"), verdict
