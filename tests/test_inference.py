"""HMM (Viterbi/forward) and naive-Bayes inference operators.

Ground truth is brute-force path enumeration in pure Python over the same
driver-computed log-prob constants — the same strategy the DuckDB oracle
uses (see __spark_entry__._hmm_sql)."""

import itertools
import math

import pytest

from gqlite_spark.operators.inference import (
    events_hmm_spec,
    hmm_forward,
    hmm_viterbi,
    naive_bayes_predict,
)

# toy sequences: (user, step, obs) with deliberate out-of-order input rows
SEQS = {
    1: ["click", "view", "purchase", "purchase", "error"],
    2: ["error", "error", "click", "signup", "view"],
    3: ["view", "view", "view", "click", "purchase"],
    4: ["signup", "purchase", "purchase", "view", "click"],
}


def _seq_df(spark):
    rows = []
    for uid, obs in SEQS.items():
        for i, o in enumerate(obs):
            rows.append((uid, i, i * 10, o))
    rows.reverse()  # operator must sort by order_cols itself
    return spark.createDataFrame(
        rows, "user_id long, ts long, event_id long, event_type string")


def _enumerate(spec, obs):
    """All (path, logp, p) by brute force, log sum in the DP's
    left-assoc order."""
    states = spec["states"]
    out = []
    for assign in itertools.product(states, repeat=len(obs)):
        logp = math.log(spec["init"][assign[0]]) + \
            math.log(spec["emit"][(assign[0], obs[0])])
        p = spec["init"][assign[0]] * spec["emit"][(assign[0], obs[0])]
        for i in range(1, len(obs)):
            logp += math.log(spec["trans"][(assign[i - 1], assign[i])])
            logp += math.log(spec["emit"][(assign[i], obs[i])])
            p *= spec["trans"][(assign[i - 1], assign[i])]
            p *= spec["emit"][(assign[i], obs[i])]
        out.append((">".join(assign), logp, p))
    return out


def test_viterbi_matches_enumeration(spark):
    spec = events_hmm_spec()
    got = {r["user_id"]: (r["path"], r["logp_e4"])
           for r in hmm_viterbi(_seq_df(spark), spec).collect()}
    assert set(got) == set(SEQS)
    for uid, obs in SEQS.items():
        best = max(_enumerate(spec, obs), key=lambda t: (t[1], t[0]))
        assert got[uid][0] == best[0], uid
        assert got[uid][1] == int(math.floor(best[1] * 10000 + 0.5)), uid


def test_forward_matches_enumeration(spark):
    spec = events_hmm_spec()
    got = {r["user_id"]: r["loglik_e4"]
           for r in hmm_forward(_seq_df(spark), spec).collect()}
    for uid, obs in SEQS.items():
        total = sum(p for _, _, p in _enumerate(spec, obs))
        assert got[uid] == pytest.approx(
            int(math.floor(math.log(total) * 10000 + 0.5)), abs=1), uid


def test_viterbi_drops_short_sequences(spark):
    df = _seq_df(spark).where("user_id <> 1 OR event_id < 30")
    got = hmm_viterbi(df, events_hmm_spec(), max_len=5).collect()
    assert {r["user_id"] for r in got} == {2, 3, 4}  # user 1 has 3 < 5


def test_gql_infer_statement(db):
    """README.md:252-268 declared form parses and decodes; gassian(mu, s)
    contributes its mean; weights normalize per state."""
    res = db.exec("""
    {
        query: hidden_variant,
        event: [{e1: 'sun'}, {e2: 'rain'}, {e3: 'wind'}],
        where: [
            [hidden_variant.v1, {->: 0.6}, e1],
            [hidden_variant.v2, {->: gassian(0.7, 0.1)}, e2],
            [hidden_variant.v3, {->: 0.5}, e3],
            [hidden_variant.v1, {->: 0.2}, hidden_variant.v2],
            [hidden_variant.v2, {->: 0.3}, hidden_variant.v3],
            [hidden_variant.v1, {->: 0.2}, hidden_variant.v1],
            [hidden_variant.v2, {->: 0.2}, hidden_variant.v2],
            [hidden_variant.v3, {->: 0.4}, hidden_variant.v3],
        ]
    };""")[0]
    assert res.error is None
    # each state emits a distinct symbol dominantly -> the identity path
    assert res.rows == ["v1>v2>v3"]
    row = res.df.collect()[0]
    assert row["logp_e4"] < 0


def test_gql_infer_statement_errors(db):
    cases = [
        ("{query: h, event: [{e1: 's'}], where: [[h.v1, {->: 'x'}, e1]]};",
         "bad edge weight"),
        ("{query: h, event: [], where: []};", "event list is empty"),
        ("{query: h, event: [{e1: 's'}], where: [[q.v1, {->: 1}, e1]]};",
         "edge source"),
        ("{query: h, event: [{e1: 's'}], where: [[h.v1, {->: 1}, zz]]};",
         "unknown edge target"),
    ]
    for gql, frag in cases:
        r = db.exec(gql)[0]
        assert r.status == "ERROR" and frag in r.error, (gql, r.error)


def test_naive_bayes_separates_obvious_classes(spark):
    rows = [(i, " ".join(["alpha", "beta", "gamma"][i % 3] * 5), "en")
            for i in range(6)]
    rows += [(i + 10, " ".join(["uno", "dos", "tres"][i % 3] * 5), "es")
             for i in range(6)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = naive_bayes_predict(docs).collect()
    assert len(out) == 12
    for r in out:
        assert r["pred_lang"] == r["lang"], r
