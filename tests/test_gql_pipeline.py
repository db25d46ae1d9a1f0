"""Engine-level pipeline statements: {dedup}, {similar}, {chunk} lower
onto the operators/ library (VERDICT r4 #6) — the ENGINE, not just the
Python API, covers the training-data pipeline.  Goldens on a small fixture
+ parse-error surface."""

import pytest

SETUP = """
{create: 'pg', group: ['docs', 'vecs']};
{upset: 'docs', vertex: [
  [1, {text: 'the quick brown fox jumps over the lazy dog today'}],
  [2, {text: 'the quick brown fox jumps over the lazy dog today'}],
  [3, {text: 'the quick brown fox jumps over the lazy dog tonight'}],
  [4, {text: 'an entirely different document about spark engines here'}]]};
{upset: 'vecs', vertex: [
  [10, {embedding: [1.0, 0.0]}],
  [11, {embedding: [0.9, 0.1]}],
  [12, {embedding: [0.0, 1.0]}],
  [13, {embedding: [-1.0, 0.0]}]]};
"""


@pytest.fixture()
def pdb(db):
    for r in db.exec(SETUP):
        assert r.error is None, r.error
    return db


def _one(db, gql):
    res = db.exec(gql)
    assert len(res) == 1 and res[0].error is None, res[0].error
    return res[0]


def test_gql_dedup_exact(pdb):
    res = _one(pdb, "{dedup: 'docs', in: 'pg', method: 'exact'};")
    rows = {tuple(r[1:]) for r in res.rows}   # (representative, n_copies)
    assert (1, 2) in rows                     # docs 1+2 share text, rep=min
    assert sum(n for _, n in rows) == 4


def test_gql_dedup_minhash_finds_near_dup(pdb):
    res = _one(pdb, "{dedup: 'docs', in: 'pg', method: 'minhash',"
                    " threshold: 0.5};")
    pairs = {(r[0], r[1]) for r in res.rows}
    assert (1, 2) in pairs                    # identical docs always pair
    assert all(a < b for a, b in pairs)
    assert not any(4 in p for p in pairs)     # unrelated doc stays out


def test_gql_chunk(pdb):
    res = _one(pdb, "{chunk: 'docs', in: 'pg', size: 4, overlap: 1};")
    by_doc = {}
    for doc_id, idx, n_toks, text in res.rows:
        by_doc.setdefault(doc_id, []).append((idx, n_toks, text))
    # 10 tokens, size 4, overlap 1 -> starts 1,4,7 -> 3 chunks of 4,4,4
    assert len(by_doc[1]) == 3
    assert by_doc[1][0][2].startswith("the quick brown fox")


def test_gql_similar_methods(pdb):
    for method in ("brute", "lsh", "ivf", "pq"):
        res = _one(pdb, "{similar: 'vecs', in: 'pg', to: [1.0, 0.0],"
                        " top: 2, method: '" + method + "'};")
        ids = [r[0] for r in res.rows]
        assert ids and ids[0] == 10, (method, res.rows)  # exact match first
        if method == "brute":
            assert ids == [10, 11]            # then the nearby vector


def test_gql_pipeline_errors(pdb):
    r = pdb.exec("{dedup: 'docs', in: 'pg', method: 'nope'};")[0]
    assert r.error and "unknown method" in r.error
    r = pdb.exec("{dedup: 'docs', in: 'pg', on: 'missing_prop'};")[0]
    assert r.error and "no property" in r.error
    r = pdb.exec("{similar: 'vecs', in: 'pg', to: 'oops'};")[0]
    assert r.error and "numeric vector" in r.error
    r = pdb.exec("{chunk: 'docs', in: 'pg', size: 4, overlap: 9};")[0]
    assert r.error and "overlap" in r.error
    r = pdb.exec("{dedup: 'docs', in: 'missing_graph'};")[0]
    assert r.error and "not exist" in r.error


def test_gql_pipeline_profile_and_ast(pdb):
    """The pipeline statements compose with the generic wrappers the same
    way query does."""
    res = _one(pdb, "ast {chunk: 'docs', in: 'pg'};")
    from gqlite_spark.gql.ast import ChunkStmt
    assert isinstance(res.value, ChunkStmt)
    res = _one(pdb, "profile {similar: 'vecs', in: 'pg', to: [1.0, 0.0]};")
    assert "TakeOrderedAndProject" in res.value
