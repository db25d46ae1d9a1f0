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
parity; the r15 plan promotes the first three statement routes plus
the two NEW library operators below (contract -> 122) and defers the
remaining statement routes to r16 — after which EVERY pipeline
statement route carries a driver gate row.

Also rehearsed here (new library surface, late-r14): `text_bm25_topk`
(BM25 sparse retrieval — integer micro-nat idf via the det-ln
polynomial, integer-quantized per-term contributions so the
per-document sum is order-independent) and `split_leakage_safe`
(deterministic md5-keyed train/val/test carve on the SOURCE key so
correlated documents co-travel — the contamination-safe split).  Their
oracles are inline below and move into oracle_sql() verbatim at
promotion.
"""

import sys

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from tools.oracle_check import compare, duck_con

sys.path.insert(0, "/root/repo")


BM25_TERMS = ["spark", "window", "merge", "dup", "key"]


def bm25_oracle_sql() -> str:
    """DuckDB oracle for the `text_bm25_topk` entry shape — built from
    the SAME dialect-parameterized expression builders the Spark path
    uses (det_ln_e6_sql for the idf micro-nats, bm25_contrib_sql for the
    quantized per-term contribution), so both engines evaluate the
    identical expression tree.  Moves into oracle_sql() at promotion."""
    from gqlite_spark.operators.text import bm25_contrib_sql, det_ln_e6_sql
    terms = ", ".join(f"'{t}'" for t in BM25_TERMS)
    idf = det_ln_e6_sql("(2 * n + 2)", "(2 * df + 1)", "duck")
    contrib = bm25_contrib_sql("idf_e6", "tf", "dl", "sumdl", "n")
    return (
        "WITH d AS (SELECT doc_id, coalesce(text, '') AS text"
        " FROM documents),"
        " dls AS (SELECT doc_id, len(string_split(text, ' '))::BIGINT"
        " AS dl FROM d),"
        " stats AS (SELECT COUNT(*)::BIGINT AS n, SUM(dl)::BIGINT"
        " AS sumdl FROM dls),"
        " tf AS (SELECT tk.doc_id, dls.dl, tk.term, COUNT(*)::BIGINT"
        " AS tf FROM (SELECT doc_id, unnest(string_split(text, ' '))"
        " AS term FROM d) tk JOIN dls USING (doc_id)"
        f" WHERE tk.term IN ({terms})"
        " GROUP BY tk.doc_id, dls.dl, tk.term),"
        " idf AS (SELECT term, n, sumdl, " + idf + " AS idf_e6"
        " FROM (SELECT term, COUNT(*)::BIGINT AS df FROM tf"
        " GROUP BY term) dfq, stats),"
        " sc AS (SELECT tf.doc_id, COUNT(*)::BIGINT AS n_terms,"
        f" SUM({contrib})::BIGINT AS score_e6"
        " FROM tf JOIN idf USING (term) GROUP BY tf.doc_id)"
        " SELECT (row_number() OVER (ORDER BY score_e6 DESC, doc_id"
        " ASC))::BIGINT AS rank, doc_id, n_terms, score_e6 FROM sc"
        " ORDER BY score_e6 DESC, doc_id ASC LIMIT 20")


SPLIT_ORACLE_SQL = (
    "SELECT doc_id, source,"
    " CASE WHEN substr(md5('v1' || CAST(source AS VARCHAR)), 1, 8)"
    " < 'cccccccc' THEN 'train'"
    " WHEN substr(md5('v1' || CAST(source AS VARCHAR)), 1, 8)"
    " < 'e6666666' THEN 'val'"
    " ELSE 'test' END AS split FROM documents")


def test_text_bm25_topk_candidate(spark):
    """Entry shape `text_bm25_topk`: BM25-scored top-20 retrieval for a
    5-term query (4 common terms + the rare 'dup', df=25/500 at sf0.01,
    so the idf spread is real) over the documents corpus.  Lucene-style
    always-positive idf ln((2N+2)/(2df+1)) in integer micro-nats via the
    libm-free det-ln polynomial; per-term contributions quantized to
    integers so the per-document sum is order-independent — cross-engine
    hash equality by construction, verified here with the gate
    comparator.  Plan: query-term filter inside the explode stage,
    1-row stats broadcast, rank filter lowered to
    TakeOrderedAndProject."""
    from gqlite_spark.operators.text import bm25_topk

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = bm25_topk(d, BM25_TERMS, k=20).toPandas()
    oracle = duck_con(SF_DIR).execute(bm25_oracle_sql()).fetchdf()
    verdict = compare(got, oracle)
    assert verdict.startswith("OK"), verdict


def test_split_leakage_safe_candidate(spark):
    """Entry shape `split_leakage_safe`: deterministic 80/10/10
    train/val/test assignment keyed on md5('v1' || source) — every
    document of one source lands in the same split (the leakage-safe
    co-travel guarantee), row order and engine never move a row, and
    the md5-prefix thresholds are the SAME machinery the sampling
    oracles already prove cross-engine."""
    from gqlite_spark.operators.sampling import split_assign

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = (split_assign(d, key_col="source", salt="v1")
           .select("doc_id", "source", "split")).toPandas()
    oracle = duck_con(SF_DIR).execute(SPLIT_ORACLE_SQL).fetchdf()
    verdict = compare(got, oracle)
    assert verdict.startswith("OK"), verdict


def hybrid_oracle_sql() -> str:
    """DuckDB oracle for the `sim_hybrid_topk` entry shape: dense
    cosine top-20 (the proven sim_cosine_topk ordering), sparse BM25
    top-20 (the proven bm25 CTEs), reciprocal-rank fusion with
    integer-quantized contributions (rrf_contrib_sql on both sides),
    fused top-10.  Moves into oracle_sql() at promotion."""
    from gqlite_spark.operators.similarity import rrf_contrib_sql
    from gqlite_spark.operators.text import bm25_contrib_sql, det_ln_e6_sql
    terms = ", ".join(f"'{t}'" for t in BM25_TERMS)
    idf = det_ln_e6_sql("(2 * n + 2)", "(2 * df + 1)", "duck")
    contrib = bm25_contrib_sql("idf_e6", "tf", "dl", "sumdl", "n")
    cos = ("list_inner_product(v, qv) / (sqrt(list_inner_product(v, v))"
           " * sqrt(list_inner_product(qv, qv)))")
    return (
        "WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings"
        " WHERE vec_id = 0),"
        " vv AS (SELECT vec_id, embedding::DOUBLE[] AS v"
        " FROM embeddings),"
        " dense AS (SELECT id, rank_dense FROM (SELECT vec_id AS id,"
        f" (row_number() OVER (ORDER BY {cos} DESC, vec_id ASC))::BIGINT"
        " AS rank_dense FROM vv, q) WHERE rank_dense <= 20),"
        " d AS (SELECT doc_id, coalesce(text, '') AS text"
        " FROM documents),"
        " dls AS (SELECT doc_id, len(string_split(text, ' '))::BIGINT"
        " AS dl FROM d),"
        " stats AS (SELECT COUNT(*)::BIGINT AS n, SUM(dl)::BIGINT"
        " AS sumdl FROM dls),"
        " tf AS (SELECT tk.doc_id, dls.dl, tk.term, COUNT(*)::BIGINT"
        " AS tf FROM (SELECT doc_id, unnest(string_split(text, ' '))"
        " AS term FROM d) tk JOIN dls USING (doc_id)"
        f" WHERE tk.term IN ({terms})"
        " GROUP BY tk.doc_id, dls.dl, tk.term),"
        " idf AS (SELECT term, n, sumdl, " + idf + " AS idf_e6"
        " FROM (SELECT term, COUNT(*)::BIGINT AS df FROM tf"
        " GROUP BY term) dfq, stats),"
        " sc AS (SELECT tf.doc_id, COUNT(*)::BIGINT AS n_terms,"
        f" SUM({contrib})::BIGINT AS score_e6"
        " FROM tf JOIN idf USING (term) GROUP BY tf.doc_id),"
        " sparse AS (SELECT doc_id, rank_sparse FROM (SELECT doc_id,"
        " (row_number() OVER (ORDER BY score_e6 DESC, doc_id"
        " ASC))::BIGINT AS rank_sparse FROM sc)"
        " WHERE rank_sparse <= 20),"
        " fused AS (SELECT coalesce(dense.id, sparse.doc_id) AS doc_id,"
        " dense.rank_dense, sparse.rank_sparse,"
        f" ({rrf_contrib_sql('dense.rank_dense')}"
        f" + {rrf_contrib_sql('sparse.rank_sparse')})::BIGINT AS rrf_e6"
        " FROM dense FULL OUTER JOIN sparse"
        " ON dense.id = sparse.doc_id)"
        " SELECT rank, doc_id, coalesce(rank_dense, 0)::BIGINT"
        " AS rank_dense, coalesce(rank_sparse, 0)::BIGINT"
        " AS rank_sparse, rrf_e6 FROM (SELECT *,"
        " (row_number() OVER (ORDER BY rrf_e6 DESC, doc_id"
        " ASC))::BIGINT AS rank FROM fused) WHERE rank <= 10")


def test_sim_hybrid_topk_candidate(spark):
    """Entry shape `sim_hybrid_topk`: hybrid dense+sparse retrieval —
    exact cosine top-20 for the vec_id=0 query vector fused with BM25
    top-20 for the 5-term query by reciprocal rank (c=60,
    integer-quantized contributions), fused top-10.  Both legs'
    rankings are already gate-proven (sim_cosine_topk, the bm25
    candidate above); fusion is a deterministic function of the ranks
    alone, verified end-to-end with the gate comparator."""
    from gqlite_spark.operators.similarity import hybrid_topk

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qvec = [float(x) for x in
            e.filter(F.col("vec_id") == 0)
            .select("embedding").collect()[0][0]]
    got = (hybrid_topk(d, e, qvec, BM25_TERMS, k=10, k_each=20)
           .withColumnRenamed("id", "doc_id")).toPandas()
    oracle = duck_con(SF_DIR).execute(hybrid_oracle_sql()).fetchdf()
    verdict = compare(got, oracle)
    assert verdict.startswith("OK"), verdict


def test_gql_retrieve_topk_candidate(spark):
    """Entry shape `gql_retrieve_topk`: BM25 top-20 END-TO-END through
    the GQL `{retrieve:}` statement (parse -> validate -> lower onto
    operators/text.bm25_topk with the group's key as doc id), against
    the same inline oracle the library-path candidate proves — the
    sparse-retrieval statement route's gate row."""
    from gqlite_spark import GQLite

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    db = GQLite(spark)
    g = db.catalog.create_graph("r15rt")
    g.create_group("docs").register_df(d, key_col="doc_id")
    terms = ", ".join(f"'{t}'" for t in BM25_TERMS)
    got = (db.query_df("{retrieve: 'docs', in: 'r15rt',"
                       f" terms: [{terms}], top: 20}};")
           .withColumnRenamed("id", "doc_id")).toPandas()
    oracle = duck_con(SF_DIR).execute(bm25_oracle_sql()).fetchdf()
    verdict = compare(got, oracle)
    assert verdict.startswith("OK"), verdict


def test_gql_split_leakage_candidate(spark):
    """Entry shape `gql_split_leakage`: the 80/10/10 source-keyed carve
    END-TO-END through the GQL `{split:}` statement, against the same
    inline oracle as the library-path candidate.  The md5 threshold
    hashes the by: property VALUE, so the group's id rename does not
    move any row."""
    from gqlite_spark import GQLite

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    db = GQLite(spark)
    g = db.catalog.create_graph("r15sl")
    g.create_group("docs").register_df(d, key_col="doc_id")
    got = (db.query_df("{split: 'docs', in: 'r15sl', by: 'source',"
                       " weights: {train: 0.8, val: 0.1, test: 0.1},"
                       " salt: 'v1'};")
           .withColumnRenamed("id", "doc_id")
           .select("doc_id", "source", "split")).toPandas()
    oracle = duck_con(SF_DIR).execute(SPLIT_ORACLE_SQL).fetchdf()
    verdict = compare(got, oracle)
    assert verdict.startswith("OK"), verdict


CROSS_JACCARD_ORACLE_SQL = (
    # word-trigram shingle sets per side (distinct, like the Spark
    # array_distinct), exact Jaccard over the shingle-block join
    "WITH sht AS (SELECT doc_id AS id, unnest(list_distinct("
    "list_transform(generate_series(1,"
    " greatest(len(string_split(text, ' ')) - 2, 0)),"
    " i -> array_to_string(list_slice(string_split(text, ' '),"
    " i, i + 2), ' ')))) AS s"
    " FROM documents WHERE doc_id % 7 <> 0),"
    " shb AS (SELECT doc_id AS id, unnest(list_distinct("
    "list_transform(generate_series(1,"
    " greatest(len(string_split(text, ' ')) - 2, 0)),"
    " i -> array_to_string(list_slice(string_split(text, ' '),"
    " i, i + 2), ' ')))) AS s"
    " FROM documents WHERE doc_id % 7 = 0),"
    " ts AS (SELECT id, COUNT(*) AS n FROM sht GROUP BY id),"
    " bs AS (SELECT id, COUNT(*) AS n FROM shb GROUP BY id),"
    " inter AS (SELECT a.id AS doc_id, b.id AS bench_id,"
    " COUNT(*) AS c FROM sht a JOIN shb b ON a.s = b.s GROUP BY 1, 2)"
    " SELECT doc_id, bench_id,"
    " round(c / (ta.n + tb.n - c), 4) AS jaccard FROM inter"
    " JOIN ts ta ON ta.id = doc_id JOIN bs tb ON tb.id = bench_id"
    " WHERE c / (ta.n + tb.n - c) >= 0.5")


def test_decontaminate_neardup_candidate(spark):
    """Entry shape `decontaminate_neardup`: cross-corpus near-dup
    decontamination — every (train, benchmark) pair at word-trigram
    Jaccard ≥ 0.5, benchmark = the doc_id % 7 == 0 subset (the same
    carve the exact-containment `decontaminate` entry uses).  The
    engine blocks on shared shingles and broadcasts the eval-set-sized
    benchmark side; the oracle is the textbook shingle-join Jaccard.
    Completes the decontamination family's driver story: exact 8-gram
    containment, embedding-space, and now lexical near-dup."""
    from gqlite_spark.operators.dedup import cross_jaccard_pairs

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = cross_jaccard_pairs(
        d.filter(F.col("doc_id") % 7 != 0),
        d.filter(F.col("doc_id") % 7 == 0),
        threshold=0.5, n=3, unit="word").toPandas()
    oracle = duck_con(SF_DIR).execute(CROSS_JACCARD_ORACLE_SQL).fetchdf()
    verdict = compare(got, oracle)
    assert verdict.startswith("OK"), verdict


def token_budget_oracle_sql() -> str:
    """DuckDB oracle for the `curation_token_budget` entry shape: the
    straightforward global-cumsum formulation (SUM OVER ORDER BY quality
    DESC, doc_id <= budget) over the PROVEN text_quality expressions —
    the Spark side must reproduce it exactly from the histogram-threshold
    two-pass plan.  Moves into oracle_sql() at promotion."""
    import __spark_entry__ as entry
    tq = entry.oracle_sql()["text_quality"]
    return ("WITH tq AS (" + tq + "),"
            " q AS (SELECT doc_id, n_tokens, quality FROM tq),"
            " b AS (SELECT SUM(n_tokens) // 5 AS budget FROM q),"
            " c AS (SELECT *, SUM(n_tokens) OVER (ORDER BY quality DESC,"
            " doc_id ASC) AS cum FROM q)"
            " SELECT doc_id, n_tokens, quality FROM c, b"
            " WHERE cum <= budget")


def test_curation_token_budget_candidate(spark):
    """Entry shape `curation_token_budget`: the best-quality subcorpus
    whose token count fits 20% of the corpus budget — selection order
    (quality DESC, doc_id ASC), running token sum ≤ budget.  The oracle
    is the textbook single-window cumsum; the Spark plan is the
    scale-safe histogram-threshold decomposition (bounded per-value
    aggregate + driver threshold scan + map-only filter above the
    threshold + tie-group-sized window AT the threshold) — parity here
    proves the decomposition is value-identical to the global cumsum."""
    from gqlite_spark.operators.sampling import select_token_budget
    from gqlite_spark.operators.text import quality_score

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    scored = quality_score(d).select("doc_id", "n_tokens", "quality")
    total = scored.agg(F.sum("n_tokens")).collect()[0][0]
    got = select_token_budget(scored, total // 5).toPandas()
    oracle = duck_con(SF_DIR).execute(token_budget_oracle_sql()).fetchdf()
    verdict = compare(got, oracle)
    assert verdict.startswith("OK"), verdict


def test_gql_token_budget_candidate(spark):
    """Entry shape `gql_token_budget`: the 20%-of-corpus token carve
    END-TO-END through the GQL `{budget:}` statement — the statement
    derives quality/n_tokens in-scan from the raw text (the {curate:}
    Columns), so the oracle is token_budget_oracle_sql with the budget
    pinned to the literal the entry computes; parity proves the
    derived-metric path and the histogram-threshold decomposition
    agree with the textbook cumsum through the statement route."""
    import __spark_entry__ as entry
    from gqlite_spark import GQLite

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    con = duck_con(SF_DIR)
    total = con.execute(
        "WITH tq AS (" + entry.oracle_sql()["text_quality"] + ")"
        " SELECT SUM(n_tokens) FROM tq").fetchone()[0]
    budget = int(total) // 5
    db = GQLite(spark)
    g = db.catalog.create_graph("r15tb")
    g.create_group("docs").register_df(d, key_col="doc_id")
    got = (db.query_df("{budget: 'docs', in: 'r15tb',"
                       f" tokens: {budget}}};")
           .withColumnRenamed("id", "doc_id")
           .select("doc_id", "n_tokens", "quality")).toPandas()
    oracle = con.execute(
        "WITH tq AS (" + entry.oracle_sql()["text_quality"] + "),"
        " q AS (SELECT doc_id, n_tokens, quality FROM tq),"
        " c AS (SELECT *, SUM(n_tokens) OVER (ORDER BY quality DESC,"
        " doc_id ASC) AS cum FROM q)"
        " SELECT doc_id, n_tokens, quality FROM c"
        f" WHERE cum <= {budget}").fetchdf()
    verdict = compare(got, oracle)
    assert verdict.startswith("OK"), verdict


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
