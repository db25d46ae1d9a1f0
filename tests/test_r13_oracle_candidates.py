"""Driver-gate dress rehearsal for the r13 contract candidates.

The r12 window is frozen (the 8 two-round-stale entries + the 4
streaming/sketch/survivor promotions + 38 r10-stale entries), so the
r12-new machinery (keep-best survivor selection wired into the one-plan
curation pipeline) ships without its own contract row this round.
These tests run EXACT entry-shaped queries against full DuckDB oracles
with the gate's own comparator (tools.oracle_check.compare — dtype
drift is a hard FAIL), so promoting them into
__spark_entry__.queries()/oracle_sql() in r13 is a copy-paste with
proven parity.
"""

import sys

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from tools.oracle_check import compare, duck_con

sys.path.insert(0, "/root/repo")


def test_curation_keep_best_candidate(spark):
    """Entry shape `curation_keep_best`: the one-plan curation pipeline
    with the purge step driven by NEAR-dup quality survivor selection
    (VERDICT r11 next #6) — LSH pairs over the train split -> connected
    components -> keep each cluster's longest member (tie -> min id) ->
    quality gate -> 8-gram benchmark decontamination -> per-language
    report.  Runs END-TO-END through the GQL `{curate: method:
    'clusters'}` statement (r12) — the default survivor metric is text
    length and the default Jaccard cut 0.7, exactly the library chain.
    The oracle replays the whole chain: the recursive-CTE pair
    closure + argmax survivor pick, then the exact curation fragments
    of the proven `curation_pipeline` oracle with the min-id dedup CTE
    swapped for the survivor purge."""
    import __spark_entry__ as entry
    from gqlite_spark import GQLite
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    db = GQLite(spark)
    g = db.catalog.create_graph("r13kb")
    g.create_group("docs").register_df(
        d.filter(F.col("doc_id") % 7 != 0), key_col="doc_id")
    g.create_group("bench").register_df(
        d.filter(F.col("doc_id") % 7 == 0), key_col="doc_id")
    got = db.query_df(
        "{curate: 'docs', in: 'r13kb', benchmark: 'bench',"
        " quality_min: 0.5, ngram: 8, method: 'clusters'};"
    ).toPandas()

    # oracle: survivor purge (closure + argmax over the TRAIN split)
    # spliced into the proven curation_pipeline oracle's fragments
    pairs_sql = entry._MINHASH_ORACLE_SQL.replace(
        "FROM documents", "FROM documents WHERE doc_id % 7 <> 0")
    cur = entry.oracle_sql()["curation_pipeline"]
    # reuse the enriched CTE verbatim; swap dd/kept for the purge form
    enriched_body = (cur[cur.index("enriched AS"):
                         cur.index("), dd AS")] + ")")
    oracle = duck_con(SF_DIR).execute(
        "WITH RECURSIVE pairs AS (" + pairs_sql + "),"
        " und AS (SELECT doc_a AS a, doc_b AS b FROM pairs"
        " UNION SELECT doc_b, doc_a FROM pairs),"
        " reach(a, b) AS (SELECT a, b FROM und"
        " UNION SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a"
        " WHERE r.a <> u.b),"
        " clus AS (SELECT a AS m, LEAST(a, MIN(b)) AS rep"
        " FROM reach GROUP BY a),"
        " sc AS (SELECT c.m, c.rep, CAST(length(d.text) AS BIGINT)"
        "        AS score FROM clus c"
        "        JOIN documents d ON d.doc_id = c.m),"
        " purge AS (SELECT m AS doc_id FROM ("
        "   SELECT m, row_number() OVER (PARTITION BY rep"
        "          ORDER BY score DESC, m ASC) AS rn FROM sc)"
        "   WHERE rn > 1),"
        " " + enriched_body + ","
        " kept AS (SELECT * FROM enriched"
        "   WHERE doc_id NOT IN (SELECT doc_id FROM purge)"
        "   AND quality >= 0.5),"
        " kw AS (SELECT doc_id, string_split(text, ' ') AS ws"
        "        FROM kept),"
        " gk AS (SELECT doc_id, unnest(list_transform("
        "generate_series(1, greatest(len(ws) - 7, 0)),"
        " i -> array_to_string(list_slice(ws, i, i + 7), ' '))) AS s"
        " FROM kw),"
        " bw AS (SELECT string_split(text, ' ') AS ws FROM documents"
        " WHERE doc_id % 7 = 0),"
        " gb AS (SELECT DISTINCT unnest(list_transform("
        "generate_series(1, greatest(len(ws) - 7, 0)),"
        " i -> array_to_string(list_slice(ws, i, i + 7), ' '))) AS s"
        " FROM bw),"
        " dirty AS (SELECT DISTINCT gk.doc_id FROM gk JOIN gb"
        " USING (s))"
        " SELECT predicted_lang, COUNT(*)::BIGINT AS n_docs,"
        " SUM(n_tokens)::BIGINT AS sum_tokens,"
        " SUM(CAST(ROUND(quality * 10000) AS BIGINT))::BIGINT"
        " AS sum_quality_e4"
        " FROM kept WHERE doc_id NOT IN (SELECT doc_id FROM dirty)"
        " GROUP BY predicted_lang").fetchdf()
    verdict = compare(got, oracle)
    assert verdict.startswith("OK"), verdict


def test_curation_best_by_candidate(spark):
    """Entry shape `curation_best_by`: the one-plan pipeline with the
    exact-hash purge keeping the BEST member per duplicate group
    (max n_tokens, tie -> min id) instead of the min-id canonical —
    the same window, a different ordering, so the cost profile is
    identical to `curation_pipeline`.  Runs END-TO-END through the
    GQL `{curate:}` statement (r12), so the parse/validate/lower
    chain is what the gate value-checks, not just the library call.
    The oracle is `curation_pipeline`'s proven SQL with the dedup
    CTE's ordering swapped to the argmax form."""
    import __spark_entry__ as entry
    from gqlite_spark import GQLite
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    db = GQLite(spark)
    g = db.catalog.create_graph("r13cur")
    g.create_group("docs").register_df(
        d.filter(F.col("doc_id") % 7 != 0), key_col="doc_id")
    g.create_group("bench").register_df(
        d.filter(F.col("doc_id") % 7 == 0), key_col="doc_id")
    got = db.query_df(
        "{curate: 'docs', in: 'r13cur', benchmark: 'bench',"
        " quality_min: 0.5, ngram: 8, best_by: 'n_tokens'};"
    ).toPandas()
    cur = entry.oracle_sql()["curation_pipeline"]
    old_dd = (" dd AS (SELECT *, MIN(doc_id) OVER (PARTITION BY"
              " md5(text)) AS rep"
              " FROM enriched),"
              " kept AS (SELECT * FROM dd WHERE doc_id = rep AND"
              " quality >= 0.5),")
    assert old_dd in cur, "curation_pipeline oracle drifted"
    new_dd = (" dd AS (SELECT *, row_number() OVER (PARTITION BY"
              " md5(text) ORDER BY n_tokens DESC, doc_id ASC) AS rn"
              " FROM enriched),"
              " kept AS (SELECT * EXCLUDE (rn) FROM dd WHERE rn = 1"
              " AND quality >= 0.5),")
    oracle = duck_con(SF_DIR).execute(
        cur.replace(old_dd, new_dd)).fetchdf()
    verdict = compare(got, oracle)
    assert verdict.startswith("OK"), verdict
