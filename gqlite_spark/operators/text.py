"""Text-analysis operators for training-data pipelines (beyond-reference,
driver north star): token counting, quality scoring, language ID, document
fingerprinting.

All pure built-in expressions (whole-stage codegen, no UDFs) and portable:
every expression has an exact ANSI-SQL equivalent so results hash-match a
DuckDB oracle bit-for-bit (counts are integers; ratios rounded to 4
decimals).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# small stopword marker sets per language for the n-gram/stopword heuristic
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in"],
    "es": ["el", "la", "de", "que", "los"],
    "fr": ["le", "la", "et", "les", "des"],
    "de": ["der", "die", "und", "das", "ist"],
}
_LANG_ORDER = ["en", "es", "fr", "de"]  # deterministic tie-break priority

STOPWORDS_EN = ["the", "and", "of", "to", "in", "a", "is", "for", "on", "it"]


def _occurrences(text_col: Column, word: str) -> Column:
    """Count of ' word ' occurrences in ' '||text||' ' via length arithmetic
    (portable to any SQL dialect; regexp semantics vary, replace does not)."""
    padded = F.concat(F.lit(" "), text_col, F.lit(" "))
    needle = f" {word} "
    # overlapping ' a a ' cases undercount identically in both engines
    return ((F.length(padded) - F.length(F.replace(padded, F.lit(needle),
                                                   F.lit(""))))
            / F.lit(len(needle))).cast("long")


def token_count(text_col: Column) -> Column:
    """Whitespace token count (single-space-separated corpus): spaces + 1."""
    return F.when(
        F.length(F.trim(text_col)) == 0, F.lit(0)
    ).otherwise(
        F.length(text_col) - F.length(F.replace(text_col, F.lit(" "),
                                                F.lit(""))) + 1
    ).cast("long")


def token_stats(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(doc_id, n_chars, n_tokens, n_distinct 3-gram shingles,
    avg_token_len) — the core size/shape profile."""
    t = F.col(text_col)
    n_tokens = token_count(t)
    non_space = F.length(F.replace(t, F.lit(" "), F.lit("")))
    return df.select(
        F.col(id_col),
        F.length(t).cast("long").alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.round(non_space / n_tokens, 4).alias("avg_token_len"),
    )


def quality_exprs(t: Column) -> "dict[str, Column]":
    """The per-doc quality metric Columns, keyed n_tokens /
    stopword_ratio / digit_ratio / quality — exposed so pipeline
    compositions can project the metrics ALONGSIDE other columns in one
    scan (the curation-pipeline entry), with the exact same expression
    order (and therefore oracle-replayable values) as
    :func:`quality_score`."""
    n_tokens = token_count(t)
    stop_hits = None
    for w in STOPWORDS_EN:
        occ = _occurrences(t, w)
        stop_hits = occ if stop_hits is None else stop_hits + occ
    digits = F.length(t) - F.length(F.regexp_replace(t, "[0-9]", ""))
    score = F.round(
        F.least(F.lit(1.0),
                F.lit(0.5) * F.least(F.lit(1.0), stop_hits / F.lit(5.0))
                + F.lit(0.5) * F.least(F.lit(1.0), n_tokens / F.lit(20.0))),
        4)
    return {"n_tokens": n_tokens,
            "stopword_ratio": F.round(stop_hits / n_tokens, 4),
            "digit_ratio": F.round(digits / F.length(t), 4),
            "quality": score}


def quality_score(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Heuristic quality features + composite score:
    stopword_ratio (EN stopword tokens / tokens), digit_ratio,
    mean token length band, and a 0-1 score.  Deterministic arithmetic.
    """
    e = quality_exprs(F.col(text_col))
    return df.select(F.col(id_col), e["n_tokens"].alias("n_tokens"),
                     e["stopword_ratio"].alias("stopword_ratio"),
                     e["digit_ratio"].alias("digit_ratio"),
                     e["quality"].alias("quality"))


def langid_exprs(t: Column) -> "tuple[Column, Column]":
    """(predicted_lang, marker_hits) Columns — the :func:`lang_id`
    expressions exposed for single-scan pipeline composition (same
    expression order, oracle-replayable)."""
    scores = {}
    for lang, words in LANG_MARKERS.items():
        s = None
        for w in words:
            occ = _occurrences(t, w)
            s = occ if s is None else s + occ
        scores[lang] = s
    best = None
    best_score = None
    for lang in reversed(_LANG_ORDER):   # earlier languages win ties
        if best is None:
            best, best_score = F.lit(lang), scores[lang]
        else:
            cond = scores[lang] >= best_score
            best = F.when(cond, F.lit(lang)).otherwise(best)
            best_score = F.when(cond, scores[lang]).otherwise(best_score)
    return best, best_score.cast("long")


def lang_id(df: DataFrame, id_col: str = "doc_id",
            text_col: str = "text") -> DataFrame:
    """Marker-word language ID (n-gram/stopword heuristic): per language,
    count marker-word occurrences; predict the max (ties: en>es>fr>de).
    Returns (doc_id, predicted_lang, score)."""
    best, best_score = langid_exprs(F.col(text_col))
    return df.select(F.col(id_col), best.alias("predicted_lang"),
                     best_score.alias("marker_hits"))


def fingerprint(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Canonical document fingerprint: md5 of the whitespace-normalized,
    lowercased text — the join key for cross-corpus exact dedup."""
    norm = F.lower(F.trim(F.col(text_col)))
    return df.select(F.col(id_col), F.md5(norm).alias("fingerprint"))


# BPE-ish token pattern: letter runs are one piece, digits and punctuation
# tokenize singly — the shape (if not the merges) of byte-pair vocabularies.
# Explicit ASCII classes so Java (Spark) and RE2 (DuckDB) agree byte-for-byte.
BPE_PATTERN = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"


def bpe_token_count(text_col: Column, pattern: str = BPE_PATTERN) -> Column:
    """Regex token-count estimator for budget/packing decisions (the
    whitespace count undercounts code/punctuation-heavy text)."""
    return F.regexp_count(text_col, F.lit(pattern)).cast("long")


def token_budget(df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """(doc_id, n_ws_tokens, n_bpe_tokens, chars_per_bpe_token) — the
    sizing profile used to pack documents into training sequences."""
    t = F.col(text_col)
    bpe = bpe_token_count(t)
    return df.select(
        F.col(id_col),
        token_count(t).alias("n_ws_tokens"),
        bpe.alias("n_bpe_tokens"),
        F.round(F.length(t) / bpe, 4).alias("chars_per_bpe_token"))


def winnow_fingerprints(df: DataFrame, k: int = 8, w: int = 4,
                        id_col: str = "doc_id",
                        text_col: str = "text",
                        hash_fn: str = "xxhash64") -> DataFrame:
    """Winnowing document fingerprints (rolling-hash selection, the
    Schleimer/Wilkerson/Aiken scheme): hash every k-char shingle, keep the
    minimum hash of each w-window of consecutive shingles, emit the
    distinct minima as the doc's fingerprint set.

    Guarantees any shared substring of length >= k + w - 1 yields a shared
    fingerprint (the near-dup/plagiarism detection property), at ~1/w the
    fingerprint density of full shingling.  All per-row array expressions
    (whole-stage codegen, no shuffle until the caller aggregates); the
    60-bit md5-prefix hash replays exactly in SQL.
    Output: (doc_id, fp) exploded rows.
    """
    t = F.col(text_col)
    n_sh = F.length(t) - F.lit(k - 1)
    if hash_fn == "xxhash64":
        # production path: cheap JVM hash (~6× faster than md5; winnowing
        # needs uniformity, not cryptographic strength)
        def _h(i):
            return F.xxhash64(t.substr(i, F.lit(k)))
    elif hash_fn == "md5":
        # SQL-oracle-replayable path (md5 exists in every engine)
        def _h(i):
            return F.conv(F.substring(F.md5(t.substr(i, F.lit(k))), 1, 15),
                          16, 10).cast("long")
    else:
        raise ValueError(f"hash_fn must be 'xxhash64' or 'md5', got {hash_fn}")
    hashes = F.transform(F.sequence(F.lit(1), F.greatest(n_sh, F.lit(1))), _h)
    # materialize the hash array under a name BEFORE the window-min pass:
    # embedding `hashes` directly in the second transform makes Catalyst
    # inline the whole shingle-hash computation into EVERY window element
    # (O(doc_len·w) md5 calls instead of O(doc_len) — measured 15× slower)
    base = (df.filter(F.length(t) >= k + w - 1)
            .select(F.col(id_col), hashes.alias("_hs")))
    n_win = F.size(F.col("_hs")) - F.lit(w - 1)
    mins = F.array_distinct(F.transform(
        F.sequence(F.lit(1), F.greatest(n_win, F.lit(1))),
        lambda j: F.array_min(F.slice(F.col("_hs"), j, w))))
    return base.select(F.col(id_col), F.explode(mins).alias("fp"))


def repetition_metrics(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Gopher-style within-document repetition / boilerplate signals:

    - ``n_tokens``            whitespace token count
    - ``distinct_ratio``      distinct tokens / tokens (round 4)
    - ``dup_3gram_frac``      (3-grams − distinct 3-grams) / 3-grams
    - ``top_token_frac``      occurrences of the most frequent token / tokens

    All zero-shuffle array expressions (split → array_distinct → size,
    embarrassingly parallel — the right shape for a 100 TB quality-filter
    pass).  The top-token count sorts the token array and takes the
    longest equal-run via a single F.aggregate scan — O(n log n) per
    document vs O(distinct × n) for counting each distinct token.
    Together with the zip-struct 3-grams below, a 500 k × 120-token probe
    corpus runs in 6.4 s on local[32] (the first lambda-heavy version
    took 127 s)."""
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    # 3-grams as zipped token-shift structs, NOT joined strings: slice +
    # arrays_zip are native (non-lambda) expressions, ~6× faster than a
    # transform building concat_ws strings (interpreted per element).
    # Struct equality ⟺ joined-string equality — tokens cannot contain
    # the split character.
    grams = F.arrays_zip(F.slice(toks, 1, n - 2), F.slice(toks, 2, n - 2),
                         F.slice(toks, 3, n - 2))
    top_cnt = F.aggregate(
        F.array_sort(toks),
        F.struct(F.lit("").alias("prev"), F.lit(0).alias("run"),
                 F.lit(0).alias("mx")),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc.prev, acc.run + 1).otherwise(F.lit(1))
            .alias("run"),
            F.greatest(acc.mx, F.when(x == acc.prev, acc.run + 1)
                       .otherwise(F.lit(1))).alias("mx")),
        lambda acc: acc.mx)
    return df.select(
        F.col(id_col),
        n.cast("long").alias("n_tokens"),
        F.round(F.size(F.array_distinct(toks)) / n, 4)
        .alias("distinct_ratio"),
        F.when(n >= 3,
               F.round((F.size(grams) - F.size(F.array_distinct(grams)))
                       / F.size(grams), 4))
        .otherwise(F.lit(0.0)).alias("dup_3gram_frac"),
        F.round(top_cnt / n, 4).alias("top_token_frac"))


def tfidf_top_terms(df: DataFrame, k: int = 5, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Top-k TF-IDF terms per document (sklearn-style smooth idf:
    ln((1+N)/(1+df)) + 1).  Returns (doc_id, rank, term, tfidf round 4).

    Scale shape: one explode + groupBy keyed on (doc, term) for term
    frequencies; document frequencies aggregate the (doc, term) table
    (vocabulary-sized result) and come back as a BROADCAST join — the fact
    table never shuffles twice.  The corpus size enters the plan as a
    lazy broadcast scalar (crossJoin on a 1-row aggregate), NOT an eager
    df.count() — no extra scan job at plan-construction time.  Top-k per
    doc is a window over the doc's own terms (partition = doc, bounded by
    vocabulary)."""
    from pyspark.sql import Window
    n_docs = df.agg(F.count("*").alias("_n"))
    tf = (df.select(F.col(id_col),
                    F.explode(F.split(F.col(text_col), " ")).alias("term"))
          .groupBy(id_col, "term").agg(F.count("*").alias("tf")))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    idf = (dfreq.crossJoin(F.broadcast(n_docs))
           .select("term",
                   (F.log((1.0 + F.col("_n")) / (1.0 + F.col("df"))) + 1.0)
                   .alias("idf")))
    w = Window.partitionBy(id_col).orderBy(
        (F.col("tf") * F.col("idf")).desc(), F.col("term").asc())
    return (tf.join(F.broadcast(idf), "term")
            .withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= k)
            .select(id_col, "rank", "term",
                    F.round(F.col("tf") * F.col("idf"), 4).alias("tfidf")))


# -- deterministic cross-engine ln --------------------------------------
# Coefficients 1/(2j+1) of the atanh series ln(m) = 2·Σ z^(2j+1)/(2j+1),
# z = (m-1)/(m+1), m ∈ [1, 2) ⇒ z ∈ [0, 1/3); 13 terms bound the
# truncation error by 2·(1/3)^27/27 ≈ 1e-14 — far inside micro-nat
# quantization.  17-significant-digit reprs parse to the identical double
# in every engine (decimal→double conversion is correctly rounded).
_ATANH_COEFFS = ["%.17e" % (1.0 / (2 * j + 1)) for j in range(13)]
_LN2 = "6.9314718055994531e-01"  # repr-exact nearest double to ln 2


def det_ln_e6_sql(num: str, den: str, dialect: str = "spark") -> str:
    """SQL text for ``floor((ln(num) - ln(den))·1e6 + 0.5)`` as BIGINT,
    computed WITHOUT libm so Spark and DuckDB agree bit-for-bit.

    libm ``ln`` is not required to be correctly rounded, and a last-ulp
    disagreement between java.lang.Math.log and C std::log on a value
    landing exactly at a ``floor(x·1e6 + 0.5)`` boundary would flip one
    micro-nat and break cross-engine hash equality (ADVICE r4).  This
    expression uses only +, −, ×, ÷ on doubles — all IEEE-754
    correctly-rounded, hence deterministic across engines — plus exact
    integer bit-length range reduction:

        k = bitlen(x) − 1;  m = x / 2^k ∈ [1, 2)   (division by a power
        of two is exact), then ln(m) via the atanh Horner series and
        ln(x) = ln(m) + k·ln2.

    ``num``/``den`` must be SQL expressions yielding positive BIGINTs
    < 2^53.  Both engines evaluate the identical expression tree (each
    SQL operator is a separate kernel — no cross-op FMA contraction), so
    the result is a deterministic function of (num, den).
    """
    return (f"cast(floor(({det_pln_sql(num, dialect)}"
            f" - {det_pln_sql(den, dialect)}) * 1e6 + 0.5)"
            f" as bigint)")


def det_pln_sql(x: str, dialect: str = "spark") -> str:
    """SQL text for the deterministic (libm-free) ``ln(x)`` double used
    by :func:`det_ln_e6_sql` — exposed separately so callers with a
    CONSTANT operand (e.g. lm_score's corpus total) can evaluate it once
    in a 1-row projection instead of inlining the full Horner tree into
    the per-row expression: half the codegen-compile cost on first run,
    bit-identical values (the subtraction sees the same doubles).
    Coefficients are emitted in scientific notation (``%.17e``) — a
    DOUBLE literal in both Spark and DuckDB — rather than
    ``cast(... as double)`` nodes, shrinking the tree ~2× for the same
    parsed values."""
    k = f"(length(bin({x})) - 1)"
    if dialect == "spark":
        shift = f"shiftleft(cast(1 as bigint), {k})"
    else:
        shift = f"(cast(1 as bigint) << {k})"
    m = f"(cast({x} as double) / cast({shift} as double))"
    z = f"(({m} - 1.0) / ({m} + 1.0))"
    z2 = f"({z} * {z})"
    h = _ATANH_COEFFS[12]
    for j in range(11, -1, -1):
        h = f"({_ATANH_COEFFS[j]} + {z2} * {h})"
    return (f"(2.0 * {z} * {h}"
            f" + cast({k} as double) * {_LN2})")


def lm_score(df: DataFrame, id_col: str = "doc_id",
             text_col: str = "text", n: int = 3) -> DataFrame:
    """Character n-gram language-model quality score, trained on the
    corpus itself (the CCNet/C4 filtering signal: documents whose
    character statistics diverge from the corpus — boilerplate, encoding
    garbage, wrong-script spam — score low and get filtered).

    Model: MLE n-gram probabilities over the whole corpus, log-probs
    quantized to integer micro-nats (``floor((ln c − ln total)·1e6 +
    0.5)``) so per-document sums are integer-exact and engine/order-
    independent.  The ln itself is the deterministic polynomial of
    :func:`det_ln_e6_sql` — NOT libm — so the quantized model is
    bit-identical across engines even at floor boundaries (ADVICE r4).  Score: mean log-prob of
    the document's n-grams, rounded to 4 places.  Documents shorter than
    ``n`` chars have no n-grams and are excluded (both engines drop them
    identically).

    Scale shape: explode n-grams (pure map) → vocabulary-sized count
    aggregate (char-n-gram vocab is BOUNDED — ~alphabet^n — independent
    of corpus size, so the model broadcast stays small at 100 TB) →
    broadcast join back → one groupBy keyed on the document.  Two
    shuffles total, one of them vocabulary-sized.  No UDFs."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    docs = df.filter(F.length(t) >= n)
    # gram generation is O(len) per document: split once into a char array,
    # zip n shifted slices into an array of n-char structs, explode the
    # structs, and join the chars back into the gram string AFTER the
    # Generate (one O(1) concat per gram).  The previous explode-positions
    # + substr(_t, _i, n) form was O(len²) per document twice over — the
    # Generate copied the carried text column into every exploded row, and
    # each substr re-scanned the string to find the char boundary — and
    # measured 2.8× slower per leg at sf0.1 (plans/r14/, OPTIMIZATION_r14).
    # Gram values are bit-identical: split('') yields exactly the
    # characters substr indexed (verified corpus-wide incl. multi-byte).
    chars = F.split(t, "")
    grams = F.arrays_zip(*[F.slice(chars, 1 + j, F.size(chars) - (n - 1))
                           for j in range(n)])
    base = (docs
            .select(F.col(id_col), F.explode(grams).alias("_g"))
            .select(F.col(id_col),
                    F.concat(*[F.col("_g").getField(str(j))
                               for j in range(n)]).alias("g")))
    counts = base.groupBy("g").agg(F.count("*").alias("c"))
    # total n-grams = Σ(length - (n-1)) over the kept docs — identical to
    # SUM(counts.c) but computed from a light column scan, so the plan
    # explodes the corpus TWICE (count + score), not three times.
    # ln(total) is CONSTANT across the model, so evaluate its Horner tree
    # once in this 1-row projection — the per-row expression keeps only
    # pln(c), halving the first-run codegen compile cost (the r5 bench
    # cold regression's attributed cause); values are bit-identical
    total = (docs.agg(F.sum(F.length(t) - (n - 1)).alias("_t"))
             .select(F.expr(det_pln_sql("_t", "spark")).alias("_lnt")))
    model = (counts.crossJoin(F.broadcast(total))
             .select("g",
                     F.expr(f"cast(floor(({det_pln_sql('c', 'spark')}"
                            " - _lnt) * 1e6 + 0.5) as bigint)")
                     .alias("lp_e6")))
    return (base.join(F.broadcast(model), "g")
            .groupBy(id_col)
            .agg(F.count("*").alias("n_grams"),
                 F.sum("lp_e6").alias("_s"))
            .select(F.col(id_col),
                    F.col("n_grams").cast("long"),
                    F.round(F.col("_s") / F.col("n_grams") / 1e6, 4)
                    .alias("avg_logp")))


def bm25_contrib_sql(idf_e6: str, tf: str, dl: str, sum_dl: str,
                     n_docs: str, k1: float = 1.2, b: float = 0.75) -> str:
    """SQL text for ONE query term's integer micro-unit BM25 contribution:
    ``floor(idf_e6 · tf·(k1+1)/(tf + k1·(1−b + b·dl/avgdl)) + 0.5)`` as
    BIGINT, with ``avgdl = sum_dl / n_docs``.

    ``idf_e6``/``tf``/``dl``/``sum_dl``/``n_docs`` must be SQL expressions
    yielding BIGINTs.  Every operation is +, −, ×, ÷ on doubles (IEEE-754
    correctly rounded, hence engine-deterministic) over integer inputs;
    the constants are emitted as ``%.17e`` scientific literals, which both
    Spark and DuckDB parse as the identical DOUBLE (a plain ``1.2`` would
    be DECIMAL in both dialects — different arithmetic).  Quantizing each
    term's contribution to an integer makes the per-document SUM
    order-independent, so cross-engine hash equality survives any
    aggregation order."""
    k1s = "%.17e" % k1
    k1p1 = "%.17e" % (k1 + 1.0)
    bs = "%.17e" % b
    omb = "%.17e" % (1.0 - b)
    avgdl = f"(cast({sum_dl} as double) / cast({n_docs} as double))"
    sat = (f"(({tf} * {k1p1}) / ({tf} + {k1s} * ({omb} + {bs}"
           f" * (cast({dl} as double) / {avgdl}))))")
    return f"cast(floor({idf_e6} * {sat} + 0.5) as bigint)"


def bm25_topk(df: DataFrame, query_terms: "list[str]", k: int = 20,
              k1: float = 1.2, b: float = 0.75, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """BM25-scored top-k document retrieval for a bag of query terms —
    the sparse-retrieval stage of a training-data curation pipeline
    (quality-targeted subcorpus selection, benchmark-adjacent document
    mining) and the classic lexical complement to the dense ANN path in
    :mod:`gqlite_spark.operators.similarity`.

    Scoring: Lucene-style always-positive idf ``ln(1 + (N − df + ½)/(df
    + ½)) = ln((2N + 2)/(2df + 1))`` — an integer ratio, so the ln is
    :func:`det_ln_e6_sql`'s libm-free polynomial in integer micro-nats —
    times the standard (k1, b) term-frequency saturation.  Per-term
    contributions are quantized to integers (:func:`bm25_contrib_sql`)
    and integer-summed per document, making the score a deterministic,
    order-independent function of (tf, dl, df, N) that hash-matches any
    engine.  Ties break on ascending id.

    Returns ``(rank, id, n_terms, score_e6)`` for the top ``k`` docs
    (docs matching no query term score nothing and are absent).

    Scale shape: the query-term filter lands INSIDE the explode stage
    (only matching (doc, term) rows ever shuffle — the fact table is
    query-sized, not corpus-sized); document frequencies aggregate that
    small table; N/avgdl ride a 1-row broadcast; the final top-k is a
    rank-filtered window that Catalyst rewrites to TakeOrderedAndProject
    (limit-through-rank-window pushdown — per-partition top-k, one
    k-row merge, rank computed on k rows only; verified in the
    formatted plan).  The corpus is exploded twice (tf and df legs),
    the same deliberate tradeoff :func:`lm_score` documents — both legs
    filter to query terms before any shuffle.  No UDFs; the only
    crossJoin is the 1-row stats broadcast."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    dl = F.size(F.split(t, " ")).cast("long")
    toks = df.select(F.col(id_col), dl.alias("dl"),
                     F.explode(F.split(t, " ")).alias("term"))
    tf = (toks.filter(F.col("term").isin(list(query_terms)))
          .groupBy(id_col, "dl", "term")
          .agg(F.count("*").cast("long").alias("tf")))
    stats = df.agg(F.count("*").cast("long").alias("_n"),
                   F.sum(dl).alias("_sumdl"))
    dfreq = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    idf = (dfreq.crossJoin(F.broadcast(stats))
           .select("term", "_n", "_sumdl",
                   F.expr(det_ln_e6_sql("(2 * _n + 2)", "(2 * df + 1)",
                                        "spark")).alias("idf_e6")))
    contrib = bm25_contrib_sql("idf_e6", "tf", "dl", "_sumdl", "_n", k1, b)
    scored = (tf.join(F.broadcast(idf), "term")
              .select(F.col(id_col), F.expr(contrib).alias("_c"))
              .groupBy(id_col)
              .agg(F.count("*").cast("long").alias("n_terms"),
                   F.sum("_c").alias("score_e6")))
    from pyspark.sql import Window
    w = Window.orderBy(F.col("score_e6").desc(), F.col(id_col).asc())
    return (scored.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= k)
            .select("rank", id_col, "n_terms", "score_e6"))


# PII patterns: intersection of Java-regex (Spark) and RE2 (DuckDB)
# syntax — no backreferences, no lookarounds, explicit character classes.
# (\b IS in the common subset: RE2 and java.util.regex agree on ASCII
# word boundaries for these digit/uppercase patterns.)
PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+"
PII_IPV4 = ("[0-9][0-9]?[0-9]?\\.[0-9][0-9]?[0-9]?\\."
            "[0-9][0-9]?[0-9]?\\.[0-9][0-9]?[0-9]?")
PII_PHONE = "\\+[0-9][0-9 ()-]{6,14}[0-9]"
PII_SSN = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"
PII_CC = "\\b[0-9]{4}[- ][0-9]{4}[- ][0-9]{4}[- ][0-9]{4}\\b"
PII_IBAN = "\\b[A-Z]{2}[0-9]{2}[A-Z0-9]{12,30}\\b"


def redact_pii(df: DataFrame, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """Scrub common PII from a text corpus: emails, IPv4 addresses,
    international-format phone numbers, US SSNs, separator-formatted
    16-digit card numbers and IBANs become ``<EMAIL>``/``<IP>``/
    ``<PHONE>``/``<SSN>``/``<CC>``/``<IBAN>`` tokens.  Returns (doc_id,
    text, n_emails, n_ipv4, n_phones, n_ssn, n_cc, n_iban) — counts are
    pre-redaction match counts for audit.

    Pure regexp built-ins (whole-stage codegen, zero shuffle — the same
    embarrassingly-parallel shape as the quality metrics).  The patterns
    deliberately use only the Java∩RE2 common syntax so the operator is
    portable across engines (and oracle-checkable against DuckDB, whose
    regexp_replace needs the 'g' flag for global replacement).
    Replacement order (email → ip → phone → ssn → cc → iban) is fixed.
    Audit counts are per-pattern matches on the RAW text; patterns rarely
    overlap (phone needs a leading '+', ssn/cc have distinct digit-group
    shapes, iban a leading uppercase country code) but adversarial inputs
    can double-count (e.g. '+44 123-45-6789' hits both phone and ssn) —
    counts may then disagree with what survived in the redacted text."""
    t = F.col(text_col)
    out = t
    for pat, tok in ((PII_EMAIL, "<EMAIL>"), (PII_IPV4, "<IP>"),
                     (PII_PHONE, "<PHONE>"), (PII_SSN, "<SSN>"),
                     (PII_CC, "<CC>"), (PII_IBAN, "<IBAN>")):
        out = F.regexp_replace(out, pat, tok)
    return df.select(
        F.col(id_col), out.alias(text_col),
        F.regexp_count(t, F.lit(PII_EMAIL)).cast("long").alias("n_emails"),
        F.regexp_count(t, F.lit(PII_IPV4)).cast("long").alias("n_ipv4"),
        F.regexp_count(t, F.lit(PII_PHONE)).cast("long").alias("n_phones"),
        F.regexp_count(t, F.lit(PII_SSN)).cast("long").alias("n_ssn"),
        F.regexp_count(t, F.lit(PII_CC)).cast("long").alias("n_cc"),
        F.regexp_count(t, F.lit(PII_IBAN)).cast("long").alias("n_iban"))


def chunk_documents(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", chunk_tokens: int = 64,
                    overlap: int = 8) -> DataFrame:
    """Split each document into fixed-size whitespace-token chunks with
    ``overlap`` tokens of left-context carried into each following chunk
    — the standard pre-tokenization step before embedding / indexing a
    long-document corpus.

    Chunk starts are ``1, 1+step, 1+2·step, …`` with
    ``step = chunk_tokens − overlap``, emitted while
    ``start ≤ max(n_tokens − overlap, 1)`` — so the final (possibly
    short) chunk is kept but a trailing start whose tokens are entirely
    contained in the previous chunk is not.

    Embarrassingly parallel: one ``split`` + array transforms + a
    ``posexplode`` per row, no shuffle, whole-stage codegen throughout —
    at 100 TB this is a pure map stage whose output partitioning follows
    the input.  Returns (doc_id, chunk_idx 1-based, n_chunk_tokens,
    chunk_text).
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    step = chunk_tokens - overlap
    # NULL text → one empty chunk row (sequence over null would silently
    # drop the document in posexplode)
    base = df.select(F.col(id_col),
                     F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
                     .alias("_tk"))
    n = F.size(F.col("_tk"))
    starts = F.sequence(F.lit(1), F.greatest(n - F.lit(overlap), F.lit(1)),
                        F.lit(step))
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            F.least(F.lit(chunk_tokens), n - s + 1).alias("n_chunk_tokens"),
            F.array_join(F.slice(F.col("_tk"), s, chunk_tokens), " ")
            .alias("chunk_text")))
    return (base.select(F.col(id_col),
                        F.posexplode(chunks).alias("_pos", "_c"))
            .select(F.col(id_col),
                    (F.col("_pos") + 1).cast("long").alias("chunk_idx"),
                    F.col("_c.n_chunk_tokens").cast("long")
                    .alias("n_chunk_tokens"),
                    F.col("_c.chunk_text").alias("chunk_text")))


def canonicalize_urls(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Append a ``url_canon`` column: the crawl-dedup canonical form of a
    URL — lowercased scheme+host, default :80/:443 ports stripped,
    fragment stripped, ``utm_*`` tracking parameters removed (with
    separator repair), trailing ``/`` and dangling ``?``/``&`` stripped.

    The normalization every web-scale corpus needs before URL-level
    dedup: the same page arrives as ``HTTP://Site.com/a/``,
    ``http://site.com:80/a?utm_source=x`` and ``http://site.com/a`` —
    one canonical key collapses them.

    Pure regexp/string built-ins in the Java∩RE2 common syntax (like
    redact_pii), so the exact same normalization replays in DuckDB for
    the oracle — zero shuffle, whole-stage codegen, scan-speed at any
    corpus size.

    Rows whose URL has no parseable ``scheme://`` prefix (e.g. bare
    ``www.a.com/x``) keep their RAW url as the canonical key: the
    scheme/host/rest extracts would all be empty for them, and
    rebuilding would collapse every scheme-less row to the same
    ``://`` key — silent over-merging in a dedup pipeline.  Default
    ports are stripped scheme-aware (:80 only under http, :443 only
    under https) so ``http://a.com:443/x`` — a different resource than
    ``http://a.com/x`` — is not merged with it."""
    u = F.col(url_col)
    scheme = F.regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    host = F.regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    rest = F.regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$", 1)
    c = F.concat(F.lower(scheme), F.lit("://"), F.lower(host), rest)
    c = F.regexp_replace(c, "#.*$", "")              # fragment
    # default ports, scheme-aware (lookahead-free: RE2 has no lookahead;
    # scheme is already lowercased by the rebuild above)
    c = F.regexp_replace(c, "^(http://[^/?#:]*):80([/?])", "$1$2")
    c = F.regexp_replace(c, "^(http://[^/?#:]*):80$", "$1")
    c = F.regexp_replace(c, "^(https://[^/?#:]*):443([/?])", "$1$2")
    c = F.regexp_replace(c, "^(https://[^/?#:]*):443$", "$1")
    # utm params: bounded passes handle runs of consecutive utm_* pairs
    # (single-pass replace can't, non-overlapping matches share the '&')
    for _ in range(3):
        c = F.regexp_replace(c, "([?&])utm_[^&#]*&", "$1")
    c = F.regexp_replace(c, "[?&]utm_[^&#]*$", "")
    c = F.regexp_replace(c, "/$", "")                # trailing slash
    c = F.regexp_replace(c, "[?&]$", "")             # dangling separator
    return df.withColumn("url_canon", F.when(scheme != "", c).otherwise(u))


def url_dedup(df: DataFrame, id_col: str = "doc_id",
              url_col: str = "url") -> DataFrame:
    """URL-level exact dedup on the canonical form: one row per distinct
    canonical URL with (url_canon, rep_id = min id, n_copies).  One
    hash-keyed aggregate (map-side partial min/count) — the same one-
    shuffle shape as exact text dedup, keyed on a far smaller string."""
    return (canonicalize_urls(df, url_col)
            .groupBy("url_canon")
            .agg(F.min(F.col(id_col)).alias("rep_id"),
                 F.count("*").alias("n_copies")))
