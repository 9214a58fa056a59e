"""Text-analysis operators for large-scale training-data pipelines.

These extend the reference's per-dataset statistics sidecar (`_index.tsv`:
cardinality + mean width per dataset, src/igd_create.c:90-111) to the
document axis: per-document token counts, quality ratios, a language-ID
heuristic, order-sensitive fingerprints, and SimHash sketches.

Every function is pure `pyspark.sql.functions` (JVM, whole-stage codegen —
no Python in the hot path) and has an exactly-matching ANSI-SQL oracle in
``__spark_entry__.py`` so the DuckDB gate hash-verifies values.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from igd_spark.hashing import h60_col
from igd_spark.tokenizer import tokens_col

# Language marker stopwords (disjoint across languages so votes are
# unambiguous). The heuristic is deterministic, not a classifier: argmax of
# marker hits, ties and zero-hit docs → 'und' (undetermined).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "nicht", "ist"),
    "en": ("the", "and", "of", "is", "was", "with"),
    "es": ("el", "los", "las", "una", "pero", "como"),
    "fr": ("le", "les", "des", "dans", "pour", "est"),
}

# Fixed English stopword list for the quality-score stopword ratio.
QUALITY_STOPWORDS: tuple[str, ...] = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
)

FP_MOD = 1 << 20  # fingerprint term-hash modulus: keeps sums in int64 range
SIMHASH_BITS = 32


def nonempty_tokens(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(tokens_col(c), lambda t: t != F.lit(""))


def bigram_structs(toks: Column) -> Column:
    """array<struct<w1,w2>> of adjacent-token bigrams — a zero-shuffle JVM
    zip of the token array with its own tail. THE corpus bigram stream:
    ``bigram_perplexity`` and ``querylang.phrase_suggest`` both derive
    their counts from this expression so the two can never diverge."""
    n = F.size(toks)
    return F.zip_with(
        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )


def bigram_counts(
    docs: DataFrame, text_col: str = "text", tokens: Column | None = None
) -> DataFrame:
    """(w1, w2, c2) — corpus bigram occurrence counts over the analyzed
    token stream (one map-side-combined agg keyed (w1, w2), bigram-vocab-
    sized). ``tokens`` overrides the token-array expression for callers
    with a configurable analyzer (phrase_suggest's ``token_split_re``)."""
    toks = (
        tokens
        if tokens is not None
        else nonempty_tokens(F.coalesce(F.col(text_col), F.lit("")))
    )
    return (
        docs.select(F.explode(bigram_structs(toks)).alias("_bg"))
        .select(F.col("_bg.w1").alias("w1"), F.col("_bg.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count("*").cast("long").alias("c2"))
    )


def quality_col(text_col: Column | str = "text") -> Column:
    """Rounded quality score as a pure expression (composable without a
    join — see pipeline.curate). Spec shared with the DuckDB oracle:
    0.4·min(n_tokens/100, 1) + 0.4·alnum_ratio + 0.2·min(stop_ratio·5, 1),
    rounded to 6 dp."""
    toks = nonempty_tokens(text_col)
    tcol = F.col(text_col) if isinstance(text_col, str) else text_col
    n_tokens = F.size(toks)
    n_chars = F.length(F.coalesce(tcol, F.lit("")))
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*QUALITY_STOPWORDS)))
    clean = F.regexp_replace(F.lower(F.coalesce(tcol, F.lit(""))), "[^a-z0-9 ]", "")
    alnum_ratio = F.when(n_chars > 0, F.length(clean) / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tokens > 0, n_stop / n_tokens).otherwise(F.lit(0.0))
    q = (
        F.lit(0.4) * F.least(n_tokens / F.lit(100.0), F.lit(1.0))
        + F.lit(0.4) * alnum_ratio
        + F.lit(0.2) * F.least(stop_ratio * F.lit(5.0), F.lit(1.0))
    )
    return F.round(q, 6).cast("double")


def lang_pred_col(text_col: Column | str = "text") -> Column:
    """Predicted language as a pure expression: argmax of marker votes,
    ties (votes desc, lang asc), zero votes → 'und'."""
    marker_votes = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        v = F.size(F.filter(nonempty_tokens(text_col), lambda t: t.isin(*markers)))
        marker_votes.append(F.struct(v.alias("votes"), F.lit(lang).alias("lang")))
    best = F.aggregate(
        F.array(*marker_votes),
        F.struct(F.lit(-1).alias("votes"), F.lit("und").alias("lang")),
        lambda acc, x: F.when(
            (x["votes"] > acc["votes"])
            | ((x["votes"] == acc["votes"]) & (x["lang"] < acc["lang"])),
            x,
        ).otherwise(acc),
    )
    return F.when(best["votes"] > 0, best["lang"]).otherwise(F.lit("und"))


def text_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_chars, n_tokens, avg_token_len, alnum_ratio,
    stopword_ratio, quality) — one row per doc, no shuffle."""
    toks = nonempty_tokens(text_col)
    n_tokens = F.size(toks)
    n_chars = F.length(F.coalesce(F.col(text_col), F.lit("")))
    tok_chars = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*QUALITY_STOPWORDS)))
    # alnum_ratio: fraction of characters that are alphanumeric or space
    clean = F.regexp_replace(F.lower(F.coalesce(F.col(text_col), F.lit(""))), "[^a-z0-9 ]", "")
    alnum_ratio = F.when(n_chars > 0, F.length(clean) / n_chars).otherwise(F.lit(0.0))
    avg_tok = F.when(n_tokens > 0, tok_chars / n_tokens).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tokens > 0, n_stop / n_tokens).otherwise(F.lit(0.0))
    # fixed linear quality score in [0,1]-ish: rewards mid-length docs with
    # clean characters and some function words (weights are part of the spec)
    quality = (
        F.lit(0.4) * F.least(n_tokens / F.lit(100.0), F.lit(1.0))
        + F.lit(0.4) * alnum_ratio
        + F.lit(0.2) * F.least(stop_ratio * F.lit(5.0), F.lit(1.0))
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_chars.cast("int").alias("n_chars"),
        n_tokens.cast("int").alias("n_tokens"),
        F.round(avg_tok, 6).cast("double").alias("avg_token_len"),
        F.round(alnum_ratio, 6).cast("double").alias("alnum_ratio"),
        F.round(stop_ratio, 6).cast("double").alias("stopword_ratio"),
        F.round(quality, 6).cast("double").alias("quality"),
    )


# BPE-ish pre-tokenizer: letter runs | digit runs | non-space symbol runs —
# the word-boundary regex BPE vocabularies are trained over (no merges here;
# counting pre-tokens approximates token budgets within a constant factor)
BPEISH_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]+"


def token_count_variants(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_ws, n_bpeish, n_alnum) — three token-budget estimators:
    whitespace split, BPE-ish pre-token regex, and the engine tokenizer.
    Pure JVM expressions; used for training-data budgeting at scale."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    ws = F.size(F.filter(F.split(t, "\\s+"), lambda x: x != F.lit("")))
    bpeish = F.size(F.regexp_extract_all(t, F.lit(BPEISH_RE), 0))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        ws.cast("int").alias("n_ws"),
        bpeish.cast("int").alias("n_bpeish"),
        F.size(nonempty_tokens(text_col)).cast("int").alias("n_alnum"),
    )


def lang_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, lang_pred, votes) — marker-stopword vote, argmax with
    (votes desc, lang asc) tie-break; zero votes → 'und'."""
    marker_votes = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        v = F.size(F.filter(nonempty_tokens(text_col), lambda t: t.isin(*markers)))
        marker_votes.append(F.struct(v.alias("votes"), F.lit(lang).alias("lang")))
    # array_max over structs orders by (votes, lang); we need max votes with
    # lang ASC tie-break → compare (votes, reversed-lang) is messy; instead
    # sort desc by votes then asc by lang via aggregate over a sorted array.
    arr = F.array(*marker_votes)
    best = F.aggregate(
        arr,
        F.struct(F.lit(-1).alias("votes"), F.lit("und").alias("lang")),
        lambda acc, x: F.when(
            (x["votes"] > acc["votes"])
            | ((x["votes"] == acc["votes"]) & (x["lang"] < acc["lang"])),
            x,
        ).otherwise(acc),
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.when(best["votes"] > 0, best["lang"]).otherwise(F.lit("und")).alias("lang_pred"),
        F.greatest(best["votes"], F.lit(0)).cast("int").alias("votes"),
    )


def fingerprint(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, fp) — order-sensitive positional fingerprint:
    fp = Σ_pos (h60(token) mod 2^20) * (pos+1). Two docs with the same
    multiset of tokens in different order get different fingerprints;
    byte-identical docs always collide (the content-address the reference's
    per-record identity lacked). Sum fits int64 for docs < ~2^43 tokens.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(nonempty_tokens(text_col)).alias("pos", "token"),
    )
    contrib = (h60_col("token") % F.lit(FP_MOD)) * (F.col("pos") + 1)
    return (
        toks.groupBy("doc_id")
        .agg(F.sum(contrib).alias("fp"))
    )


def simhash(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
            bits: int = SIMHASH_BITS) -> DataFrame:
    """(doc_id, simhash) — tf-weighted SimHash over h60 term hashes.

    bit_j(doc) = [ Σ_term tf * (2*((h60(term)>>j)&1) - 1) >= 0 ]
    simhash    = Σ_j bit_j << j

    Near-duplicate docs differ in few bits (hamming distance on the sketch).
    Plan: explode tokens → (doc, term, tf) hash agg → explode bit axis →
    hash agg by (doc, bit) → pivot-free bit packing by sum of shifts.
    """
    tf = (
        docs.select(F.col(id_col).alias("doc_id"),
                    F.explode(nonempty_tokens(text_col)).alias("term"))
        .groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
        .withColumn("h", h60_col("term"))
    )
    bitsdf = tf.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("j"),
        (F.col("tf") * (F.expr("shiftright(h, j)").bitwiseAND(F.lit(1)) * 2 - 1)).alias("c"),
    )
    bitvals = (
        bitsdf.groupBy("doc_id", "j")
        .agg(F.sum("c").alias("s"))
        .select("doc_id", F.when(F.col("s") >= 0, F.expr("shiftleft(1L, j)")).otherwise(F.lit(0)).alias("bv"))
    )
    return bitvals.groupBy("doc_id").agg(F.sum("bv").alias("simhash"))


def hamming64(a: Column | str, b: Column | str) -> Column:
    """Hamming distance between two long sketches (bit_count of xor)."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.bit_count(ca.bitwiseXOR(cb))


def keywords_topk(
    docs: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_dp: int | None = None,
) -> DataFrame:
    """(doc_id, rank, term, tfidf) — each document's top-k terms by
    tf·idf, idf = ln(n_docs / df), ties broken (tfidf desc, term asc).
    The document-axis sibling of the per-dataset stats sidecar
    (src/igd_create.c:90-111): a cheap per-doc topical signature used for
    corpus browsing, cluster labeling, and routing in training-data
    pipelines.

    Plan: postings → one df agg (fine term key) → broadcast a 1-row count
    (plan stays lazy, zero driver jobs) → window per doc_id. Two shuffles
    total (df agg + the doc window), both on fine-grained keys — scales.
    round_dp rounds tfidf BEFORE ranking so two engines rank identical
    values (the cross-engine rank protocol used by the gate)."""
    from igd_spark.tokenizer import postings as _postings
    from pyspark.sql import Window

    post = _postings(docs, text_col=text_col, id_col=id_col)
    df_tab = post.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = docs.select(F.count("*").alias("n_docs"))
    scored = (
        post.join(df_tab, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            (F.col("tf") * F.log(F.col("n_docs") / F.col("df"))).alias("tfidf"),
        )
    )
    if round_dp is not None:
        scored = scored.withColumn("tfidf", F.round("tfidf", round_dp))
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "rank", "term", "tfidf")
    )


def unigram_perplexity(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lm: DataFrame | None = None,
    total_tokens: int | None = None,
    alpha: float = 0.0,
    round_dp: int | None = None,
) -> DataFrame:
    """Per-document perplexity under a unigram language model — the cheap
    KenLM stand-in every pretraining-data pipeline scores with (low ppl ≈
    ordinary prose, high ppl ≈ gibberish/boilerplate/wrong-language):
    (doc_id, n_tokens, ppl) with ppl = exp(-(1/n) Σ_t tf·ln p(t)); empty
    docs have no tokens to score and yield no row.

    By default the LM is the corpus itself (MLE — no zeros, since every
    scored token was counted).  Pass ``lm`` ((term, cf) rows from a
    REFERENCE corpus, e.g. `term_stats`-shaped counts off a trusted slice)
    plus ``total_tokens`` to score against an external model; then Lidstone
    smoothing with ``alpha`` > 0 handles OOV terms: p = (cf+α)/(total+α·V)
    with V the LM vocabulary size (+1 for the OOV bucket).

    Scale: term counts are one map-side-combined agg keyed term
    (vocab-sized output); the score join is postings ⋈ cf on term then a
    hash agg on doc_id — the index build's own shuffle shape, nothing
    corpus-squared.  Training the LM once and persisting it amortizes the
    cf agg across scoring runs.
    """
    from igd_spark.tokenizer import postings as _post

    p = _post(docs, text_col=text_col, id_col=id_col)
    if lm is None:
        lm = p.groupBy("term").agg(F.sum("tf").cast("long").alias("cf"))
        total_row = lm.agg(
            F.sum("cf").alias("t"), F.count("*").alias("v")
        ).collect()[0]
        total, vocab = int(total_row["t"] or 0), int(total_row["v"] or 0)
    else:
        lm = lm.select("term", F.col("cf").cast("long").alias("cf"))
        if total_tokens is None:
            raise ValueError("external lm needs total_tokens")
        total, vocab = int(total_tokens), lm.count()
    if alpha < 0:
        raise ValueError("alpha must be >= 0")
    if alpha == 0.0:
        j = p.join(lm, "term")  # MLE: OOV terms are silently unscorable
        logp = F.log(F.col("cf") / F.lit(float(total)))
    else:
        j = p.join(lm, "term", "left")
        denom = float(total) + alpha * (vocab + 1)
        logp = F.log(
            (F.coalesce(F.col("cf"), F.lit(0)) + F.lit(alpha)) / F.lit(denom)
        )
    scored = j.groupBy(F.col("doc_id")).agg(
        F.sum(F.col("tf") * logp).alias("_lp"),
        F.sum("tf").cast("long").alias("n_tokens"),
    )
    ppl = F.exp(-F.col("_lp") / F.col("n_tokens"))
    out = scored.select(
        "doc_id", "n_tokens",
        (F.round(ppl, round_dp) if round_dp is not None else ppl)
        .cast("double").alias("ppl"),
    )
    return out


def bigram_perplexity(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_dp: int | None = None,
) -> DataFrame:
    """Per-document perplexity under the corpus bigram MLE language model
    — one order up from `unigram_perplexity`, and the better
    boilerplate/gibberish separator because it scores LOCAL word order
    (a bag of plausible words in an implausible order is invisible to the
    unigram model): (doc_id, n_bigrams, ppl) with
    ppl = exp(-(1/m) Σ ln p(w_i | w_{i-1})), p = c(w_{i-1} w_i) / c1(w_{i-1}),
    where c counts corpus bigram occurrences and c1(w) counts occurrences
    of w as a bigram LEFT context (i.e. excluding doc-final positions, so
    Σ_y c(w, y) = c1(w) and the model normalizes exactly).  MLE has no
    zeros by construction — every scored bigram was counted.  Docs with
    fewer than 2 tokens have no bigrams and yield no row.

    Scale: the bigram stream is a zero-shuffle JVM zip of the token array
    with its own tail; corpus counts are one map-side-combined agg keyed
    (w1, w2) (bigram-vocab-sized); scoring is a join on the same key plus
    a doc_id hash agg — the same shuffle class as the unigram scorer, just
    on a wider key."""
    toks = nonempty_tokens(F.coalesce(F.col(text_col), F.lit("")))
    bg = (
        docs.select(F.col(id_col).alias("doc_id"), bigram_structs(toks).alias("_bgs"))
        .select("doc_id", F.explode("_bgs").alias("_bg"))
        .select("doc_id", F.col("_bg.w1").alias("w1"), F.col("_bg.w2").alias("w2"))
    )
    c2 = bg.groupBy("w1", "w2").agg(F.count("*").cast("long").alias("c2"))
    c1 = c2.groupBy("w1").agg(F.sum("c2").cast("long").alias("c1"))
    j = bg.join(c2, ["w1", "w2"]).join(c1, "w1")
    scored = j.groupBy("doc_id").agg(
        F.sum(F.log(F.col("c2") / F.col("c1"))).alias("_lp"),
        F.count("*").cast("long").alias("n_bigrams"),
    )
    ppl = F.exp(-F.col("_lp") / F.col("n_bigrams"))
    return scored.select(
        "doc_id", "n_bigrams",
        (F.round(ppl, round_dp) if round_dp is not None else ppl)
        .cast("double").alias("ppl"),
    )


def categorize_text(
    docs: DataFrame,
    k: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The ES ``categorize_text`` aggregation surface as a DETERMINISTIC
    log-template miner (the Drain-style shape): every token containing a
    digit is masked to ``*`` (ids, counters, hex, timestamps — the parts
    that vary between repetitions of one message template), the masked
    token join IS the category key, and messages group by it.  Output
    (category, n_docs, example_doc_id) with example = the lowest doc_id in
    the category (deterministic, unlike ES's first-seen example); ordered
    top-k by (n_docs desc, category asc) when ``k`` is given, the full
    category table otherwise — over agent transcripts this is the "what
    are the recurring tool-error shapes" primitive.

    ES's implementation clusters by token-prefix trees and can merge
    near-identical templates; the digit-mask rule is the deterministic
    core of that family (identical masking = identical category), chosen
    here because reproducibility is what makes the operator usable as a
    dedup/monitoring KEY at pipeline scale.

    Scale: masking is one JVM array transform per doc (zero shuffle);
    the group-by is map-side combinable on the template key, output is
    template-cardinality-sized."""
    toks = nonempty_tokens(F.coalesce(F.col(text_col), F.lit("")))
    masked = F.transform(
        toks,
        lambda t: F.when(t.rlike("[0-9]"), F.lit("*")).otherwise(t),
    )
    cat = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.array_join(masked, " ").alias("category"),
        )
        .filter(F.col("category") != "")
        .groupBy("category")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("doc_id").alias("example_doc_id"),
        )
    )
    if k is None:
        return cat
    from pyspark.sql import Window as _W

    w = _W.orderBy(F.desc("n_docs"), F.asc("category"))
    return (
        cat.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("rank", "category", "n_docs", "example_doc_id")
    )
