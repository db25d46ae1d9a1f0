"""Driver-gate dress rehearsal for the r15 contract candidates.

The r14 window is frozen (the 14 two-round-stale entries + the 3
streaming/{similar:} promotions + 33 r12-stale entries), so statement
routes that earn a gate row next ship without their own contract row
this round.  r14 put the FIRST gate row on a pipeline statement route
({similar:}); these rehearse the remaining SIX — {dedup:}, {funnel:},
{sample:}, {cohort:}, {chunk:} and {shards:} end-to-end through GQL
against the SAME proven oracles their library-path twins already pass,
with the gate's own comparator (tools.oracle_check.compare — dtype
drift is a hard FAIL).  Promoting any of them into
__spark_entry__.queries() / oracle_sql() is a copy-paste with proven
parity; the r15 plan promotes the first three (contract -> 120) and
defers the rest to r16 — after which EVERY pipeline statement route
carries a driver gate row.
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


def test_gql_event_cohort_candidate(spark):
    """Entry shape `gql_event_cohort`: the daily cohort retention matrix
    END-TO-END through the GQL `{cohort:}` statement (lowering onto
    operators/temporal.cohort_retention — two keyed aggregates over
    (user, bucket) distinct state), against the PROVEN
    event_cohort_retention oracle."""
    import __spark_entry__ as entry
    from gqlite_spark import GQLite

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    db = GQLite(spark)
    g = db.catalog.create_graph("r15co")
    g.create_group("ev").register_df(ev, key_col="event_id")
    got = db.query_df(
        "{cohort: 'ev', in: 'r15co', by: 'user_id', ts: 'ts',"
        " bucket: 86400};").toPandas()

    oracle = duck_con(SF_DIR).execute(
        entry.oracle_sql()["event_cohort_retention"]).fetchdf()
    verdict = compare(got, oracle)
    assert verdict.startswith("OK"), verdict


def test_gql_text_chunking_candidate(spark):
    """Entry shape `gql_text_chunking`: fixed-size overlapping token
    chunking END-TO-END through the GQL `{chunk:}` statement (lowering
    onto operators/text.chunk_documents — pure map stage, zero
    shuffle), against the PROVEN text_chunking oracle."""
    import __spark_entry__ as entry
    from gqlite_spark import GQLite

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    db = GQLite(spark)
    g = db.catalog.create_graph("r15ch")
    g.create_group("docs").register_df(d, key_col="doc_id")
    got = (db.query_df("{chunk: 'docs', in: 'r15ch',"
                       " size: 64, overlap: 8};")
           .withColumnRenamed("id", "doc_id")).toPandas()

    oracle = duck_con(SF_DIR).execute(
        entry.oracle_sql()["text_chunking"]).fetchdf()
    verdict = compare(got, oracle)
    assert verdict.startswith("OK"), verdict


def test_gql_training_shards_candidate(spark, tmp_path):
    """Entry shape `gql_training_shards`: the deterministic epoch-shard
    export END-TO-END through the GQL `{shards:}` statement (lowering
    onto operators/sampling.write_training_shards; the statement's
    result rows are the PRE-write lineage report — map-side partials,
    never a re-read of the export), against the PROVEN training_shards
    oracle.  The md5 shard assignment hashes the key VALUE, so the
    group's id rename does not move any row; the library entry proves
    the written files, this proves the report path — same oracle
    values either way."""
    import __spark_entry__ as entry
    from gqlite_spark import GQLite

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    db = GQLite(spark)
    g = db.catalog.create_graph("r15sh")
    g.create_group("docs").register_df(d, key_col="doc_id")
    got = db.query_df(
        "{shards: 'docs', in: 'r15sh', path: '" + str(tmp_path / "ep1")
        + "', n: 16, salt: 'ep1'};").toPandas()

    oracle = duck_con(SF_DIR).execute(
        entry.oracle_sql()["training_shards"]).fetchdf()
    verdict = compare(got, oracle)
    assert verdict.startswith("OK"), verdict
