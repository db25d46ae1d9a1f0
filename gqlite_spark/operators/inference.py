"""Probabilistic inference operators: HMM decode (Viterbi / forward) and
naive-Bayes classification.

Reference surface: README.md section 4.6 "Inference" declares an HMM
statement form ``{query: hidden_variant, event: [...], where: [[v1,
{->: 0.2}, e1], ...]}`` — with ZERO implementing LoC anywhere in the
reference tree (no operand/ file, no grammar action).  This module gives
that declared surface real distributed semantics, Spark-first:

- **HMM (Viterbi / forward)** — one decode is a tiny O(T·S²) dynamic
  program; at 100 TB the parallelism axis is the MILLIONS of independent
  sequences, not the DP itself.  We group by the sequence key and run the
  numpy DP per group through ``applyInPandas`` (Arrow batches): exactly one
  shuffle, keyed on the sequence id, no driver collect.  Log-probabilities
  are precomputed on the driver as plain Python floats so an external SQL
  oracle can embed bit-identical double literals (see
  ``viterbi_logprob_literals``).
- **Naive Bayes** — training and scoring are pure relational algebra
  (count aggregates + broadcast joins + a log-sum groupBy), entirely
  JVM-side built-ins, no UDF.  The label grid (#labels, e.g. 4 languages)
  is broadcast; token statistics are broadcast; the only wide exchange is
  the final (doc, label) score aggregation, keyed on the doc id.

Determinism: Viterbi accumulates log-space sums strictly left-to-right in
temporal order (init, emit₀, trans₀₁, emit₁, …) so a SQL oracle that sums
the same double literals in the same order reproduces the score
bit-for-bit.  Ties (exactly equal float scores) break toward the
lexicographically smallest state path; with generic (all-distinct)
probability constants they do not occur.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "events_hmm_spec",
    "hmm_viterbi",
    "hmm_forward",
    "viterbi_logprob_literals",
    "naive_bayes_predict",
]

# log of the emission prob used for an observation symbol absent from the
# spec (keeps the DP total-ordered instead of raising on stray symbols)
_UNSEEN_LOG = math.log(1e-12)


def events_hmm_spec() -> dict:
    """The canonical demo HMM over the events table's five event types.

    Three hidden states (alphabetical so state-index order == lexicographic
    order), generic all-distinct probabilities: no two distinct state paths
    can produce exactly equal float scores, so argmax is unambiguous.
    """
    return {
        "states": ["browse", "buy", "churn"],
        "init": {"browse": 0.58, "buy": 0.27, "churn": 0.15},
        "trans": {
            ("browse", "browse"): 0.61, ("browse", "buy"): 0.25,
            ("browse", "churn"): 0.14,
            ("buy", "browse"): 0.18, ("buy", "buy"): 0.53,
            ("buy", "churn"): 0.29,
            ("churn", "browse"): 0.35, ("churn", "buy"): 0.22,
            ("churn", "churn"): 0.43,
        },
        "emit": {
            ("browse", "click"): 0.31, ("browse", "view"): 0.27,
            ("browse", "signup"): 0.19, ("browse", "purchase"): 0.12,
            ("browse", "error"): 0.11,
            ("buy", "click"): 0.12, ("buy", "view"): 0.18,
            ("buy", "signup"): 0.21, ("buy", "purchase"): 0.33,
            ("buy", "error"): 0.16,
            ("churn", "click"): 0.22, ("churn", "view"): 0.13,
            ("churn", "signup"): 0.14, ("churn", "purchase"): 0.19,
            ("churn", "error"): 0.32,
        },
    }


def _log_tables(spec: dict):
    """(states, log_init[S], log_trans[S,S], {obs: log_emit[S]}) as float64,
    logs taken once on the driver (math.log) so every engine sees the same
    double constants."""
    states = list(spec["states"])
    idx = {s: i for i, s in enumerate(states)}
    s_n = len(states)
    log_init = np.full(s_n, _UNSEEN_LOG)
    for s, p in spec["init"].items():
        log_init[idx[s]] = math.log(p)
    log_trans = np.full((s_n, s_n), _UNSEEN_LOG)
    for (a, b), p in spec["trans"].items():
        log_trans[idx[a], idx[b]] = math.log(p)
    log_emit: dict[str, np.ndarray] = {}
    for (s, o), p in spec["emit"].items():
        log_emit.setdefault(o, np.full(s_n, _UNSEEN_LOG))[idx[s]] = \
            math.log(p)
    return states, log_init, log_trans, log_emit


def viterbi_logprob_literals(spec: dict) -> dict:
    """Exact double literals (repr round-trips) of every log-probability,
    for building an external SQL oracle that matches bit-for-bit:
    {'init': {state: lit}, 'trans': {(a,b): lit}, 'emit': {(s,o): lit}}."""
    return {
        "init": {s: repr(math.log(p)) for s, p in spec["init"].items()},
        "trans": {k: repr(math.log(p)) for k, p in spec["trans"].items()},
        "emit": {k: repr(math.log(p)) for k, p in spec["emit"].items()},
    }


def hmm_viterbi(df: DataFrame, spec: dict, seq_col: str = "user_id",
                obs_col: str = "event_type",
                order_cols=("ts", "event_id"),
                max_len: int = 5, min_len: int | None = None) -> DataFrame:
    """Most-likely hidden-state path per sequence.

    Returns (seq_col, path 'a>b>...', logp_e4) — logp_e4 is the exact
    left-assoc log-space sum scaled by 1e4 and rounded (integer-scaled per
    the cross-engine exactness conventions).  Sequences shorter than
    min_len (default max_len) are dropped.

    One shuffle (groupBy seq_col); DP is O(max_len·S²) per sequence inside
    an Arrow batch.  Reference parity: README.md:252-268 declared surface,
    0 LoC in the reference.
    """
    need = min_len if min_len is not None else max_len
    states, log_init, log_trans, log_emit = _log_tables(spec)
    seq_field = df.schema[seq_col]
    out_schema = (f"{seq_col} {seq_field.dataType.simpleString()}, "
                  f"path string, logp_e4 long")
    # closure must be self-contained (no module globals) so cloudpickle
    # ships it by value — executors may not have gqlite_spark on sys.path
    order_list = list(order_cols)
    unseen_log = _UNSEEN_LOG

    def decode(pdf: pd.DataFrame) -> pd.DataFrame:
        obs = (pdf.sort_values(order_list, kind="mergesort")[obs_col]
               .head(max_len).tolist())
        if len(obs) < need:
            return pd.DataFrame(
                {seq_col: [], "path": [], "logp_e4": []})
        unseen = np.full(len(states), unseen_log)
        # left-assoc accumulation: ((init + e0) + t01) + e1 ...
        v = log_init + log_emit.get(obs[0], unseen)
        back = []
        for o in obs[1:]:
            scores = v[:, None] + log_trans
            bp = np.argmax(scores, axis=0)
            v = scores[bp, np.arange(len(states))] + \
                log_emit.get(o, unseen)
            back.append(bp)
        best = int(np.argmax(v))
        rev = [best]
        for bp in reversed(back):
            rev.append(int(bp[rev[-1]]))
        path = ">".join(states[i] for i in reversed(rev))
        return pd.DataFrame({
            seq_col: [pdf[seq_col].iloc[0]],
            "path": [path],
            "logp_e4": [int(math.floor(float(v[best]) * 10000.0 + 0.5))],
        })

    return df.groupBy(seq_col).applyInPandas(decode, out_schema)


def hmm_forward(df: DataFrame, spec: dict, seq_col: str = "user_id",
                obs_col: str = "event_type",
                order_cols=("ts", "event_id"),
                max_len: int = 5, min_len: int | None = None) -> DataFrame:
    """Sequence log-likelihood P(observations) per sequence (forward
    algorithm, prob space — all-positive sums are well-conditioned, and a
    flat sum-over-paths oracle matches to well past 4 decimals).

    Returns (seq_col, loglik_e4).  Same shuffle shape as hmm_viterbi.
    """
    need = min_len if min_len is not None else max_len
    states, log_init, log_trans, log_emit = _log_tables(spec)
    init = np.exp(log_init)
    trans = np.exp(log_trans)
    emit = {o: np.exp(v) for o, v in log_emit.items()}
    seq_field = df.schema[seq_col]
    out_schema = (f"{seq_col} {seq_field.dataType.simpleString()}, "
                  f"loglik_e4 long")
    order_list = list(order_cols)

    def fwd(pdf: pd.DataFrame) -> pd.DataFrame:
        obs = (pdf.sort_values(order_list, kind="mergesort")[obs_col]
               .head(max_len).tolist())
        if len(obs) < need:
            return pd.DataFrame({seq_col: [], "loglik_e4": []})
        unseen = np.full(len(states), 1e-12)
        alpha = init * emit.get(obs[0], unseen)
        for o in obs[1:]:
            alpha = (alpha @ trans) * emit.get(o, unseen)
        return pd.DataFrame({
            seq_col: [pdf[seq_col].iloc[0]],
            "loglik_e4": [int(math.floor(math.log(float(alpha.sum()))
                                         * 10000.0 + 0.5))],
        })

    return df.groupBy(seq_col).applyInPandas(fwd, out_schema)


def naive_bayes_predict(docs: DataFrame, label_col: str = "lang",
                        id_col: str = "doc_id", text_col: str = "text",
                        alpha: float = 1.0) -> DataFrame:
    """Multinomial naive Bayes, trained and applied on the same corpus
    (resubstitution): P(label | tokens) ∝ P(label)·∏P(token|label) with
    Laplace smoothing ``alpha``.

    Pure built-in relational ops: token/label count aggregates, the label
    grid and the token-count table broadcast, one final (doc,label)
    log-sum aggregation keyed on the doc id.  Scores are float sums whose
    accumulation order differs between engines, so only the argmax label
    is emitted (ties — exactly equal scores — break to the
    lexicographically smallest label; distinct class priors make them
    practically impossible).

    Returns (id_col, label_col [true], pred label).
    """
    toks = docs.select(
        F.col(id_col), F.col(label_col),
        F.explode(F.split(F.col(text_col), " ")).alias("token"))
    class_tok = toks.groupBy(label_col, "token").agg(
        F.count("*").alias("c"))
    class_tot = toks.groupBy(label_col).agg(F.count("*").alias("tot"))
    vocab_n = toks.select("token").distinct().count()
    n_docs = docs.count()
    priors = docs.groupBy(label_col).agg(
        F.log(F.count("*") / F.lit(float(n_docs))).alias("log_prior"))

    labels = (priors.join(class_tot, label_col)
              .withColumnRenamed(label_col, "cand"))
    grid = (toks.select(id_col, "token")
            .join(F.broadcast(labels)))          # #labels-way fanout
    scored = grid.join(
        F.broadcast(class_tok.withColumnRenamed(label_col, "cand")),
        ["cand", "token"], "left")
    term = F.log((F.coalesce(F.col("c"), F.lit(0)) + F.lit(alpha))
                 / (F.col("tot") + F.lit(alpha) * F.lit(float(vocab_n))))
    scores = (scored.groupBy(id_col, "cand")
              .agg((F.sum(term) + F.first("log_prior")).alias("score")))
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("cand").asc())
    pred = (scores.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select(F.col(id_col), F.col("cand").alias("pred_lang")))
    return (docs.select(id_col, label_col)
            .join(pred, id_col))
