"""Training-data preparation operators — boilerplate span removal,
intra-document repetition stats, deterministic stratified sampling, and
training-sequence packing.

These extend the curation chain (pipeline.py) with the remaining stages a
100 TB pretraining pipeline runs between "raw corpus" and "token stream":

- remove_boilerplate: C4-style removal of text spans that repeat across
  many documents (headers, footers, license blurbs). Lines don't exist in
  this corpus shape, so the unit is the consecutive k-token span — the
  same windowing discipline, content-hash keyed, join-generated (never
  all-pairs).
- repetition_stats: Gopher-style intra-document repetition signals
  (top-token fraction, duplicate n-gram fractions) used as quality gates.
- sample_stratified: deterministic per-stratum downsampling via the
  engine's cross-engine h60 hash — the same doc keeps/drops on every run,
  every engine, every cluster size (no RNG state, no sampleBy
  nondeterminism across retries).
- pack_sequences: assign documents to fixed-token-budget training
  sequences. Packing is inherently sequential, so it is sharded: docs are
  hash-partitioned into n_shards independent streams and packed
  sequentially within each shard (one window per shard — parallelism =
  n_shards, the standard per-worker packing semantics of training
  pipelines).

Everything is pyspark.sql built-ins over the engine's tokenizer semantics
(lowercase, split on non-alphanumeric — tokenizer.py), so every operator
has an exact DuckDB oracle. No Python UDFs, no collects.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from igd_spark.hashing import h60_col
from igd_spark.textstats import nonempty_tokens

DEFAULT_SPAN_TOKENS = 8
DEFAULT_MIN_SPAN_DF = 2
DEFAULT_SEQ_BUDGET = 512
DEFAULT_PACK_SHARDS = 32


def _span_array(toks: Column, k: int) -> Column:
    """Array of consecutive disjoint k-token spans (space-joined); the
    ragged tail span keeps its < k tokens. Empty token list → empty array
    (Spark's sequence(0, -1) is DESCENDING, so it must be guarded — same
    pitfall as dedup.shingles)."""
    n_spans = F.ceil(F.size(toks) / F.lit(k)).cast("int")
    return F.when(
        F.size(toks) > 0,
        F.transform(
            F.sequence(F.lit(0), n_spans - 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i * k + 1, k)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def span_df(
    docs: DataFrame,
    span_tokens: int = DEFAULT_SPAN_TOKENS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(span, df) — cross-corpus document frequency of each distinct
    k-token span. One shuffle on the span value (fine-grained content key,
    no skew beyond genuinely boilerplate spans — which is the signal)."""
    toks = nonempty_tokens(text_col)
    spans = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(_span_array(toks, span_tokens)).alias("span")
    )
    return spans.groupBy("span").agg(F.count_distinct("doc_id").alias("df"))


def remove_boilerplate(
    docs: DataFrame,
    span_tokens: int = DEFAULT_SPAN_TOKENS,
    min_df: int = DEFAULT_MIN_SPAN_DF,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_spans, n_removed, clean_text) for EVERY document — spans
    whose corpus document frequency ≥ min_df are dropped, the survivors are
    reassembled in original order. Docs that are entirely boilerplate (or
    empty) come back with clean_text = ''.

    Plan shape at scale: explode → one groupBy on span (df) → join back on
    span → one groupBy on doc_id (reassembly) → one left join on doc_id.
    All keys are fine-grained; the span-df table is NOT broadcast (it is
    corpus-sized), the joins are shuffle hash joins on content keys."""
    toks = nonempty_tokens(text_col)
    spans = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(_span_array(toks, span_tokens)).alias("span_id", "span"),
    )
    sdf = span_df(docs, span_tokens=span_tokens, text_col=text_col, id_col=id_col)
    flagged = spans.join(sdf, "span").withColumn("is_bp", F.col("df") >= min_df)
    per_doc = flagged.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_spans"),
        F.sum(F.col("is_bp").cast("long")).alias("n_removed"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(~F.col("is_bp"), F.struct("span_id", "span"))
                    )
                ),
                lambda x: x["span"],
            ),
            " ",
        ).alias("clean_text"),
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
            F.coalesce("n_removed", F.lit(0)).alias("n_removed"),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        )
    )


def repetition_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, n_tokens, top_token_frac, dup_bigram_frac, dup_trigram_frac)
    — intra-document repetition signals (Gopher-style quality gates):
    top_token_frac = tf of the most frequent token / n_tokens;
    dup_ngram_frac = 1 - |distinct n-grams| / |n-grams|. Zero-token docs
    report 0 for every fraction. Fractions rounded to 6 dp.

    The n-gram fractions are computed array-side (no explode — a size()
    over array_distinct inside one projection); the top-token tf uses the
    postings-style explode + two-level aggregation, partial-aggregated
    map-side on the fine-grained (doc_id, term) key."""
    toks = nonempty_tokens(text_col)

    def ngrams(n: int) -> Column:
        return F.when(
            F.size(toks) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
            ),
        ).otherwise(F.array().cast("array<string>"))

    def dup_frac(n: int) -> Column:
        ng = ngrams(n)
        return F.round(
            F.when(
                F.size(ng) > 0,
                1.0 - F.size(F.array_distinct(ng)) / F.size(ng),
            ).otherwise(F.lit(0.0)),
            6,
        )

    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).cast("long").alias("n_tokens"),
        dup_frac(2).alias("dup_bigram_frac"),
        dup_frac(3).alias("dup_trigram_frac"),
    )
    top = (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(toks).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
        .groupBy("doc_id")
        .agg(F.max("tf").alias("top_tf"))
    )
    return (
        base.join(top, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.round(
                F.when(F.col("n_tokens") > 0, F.col("top_tf") / F.col("n_tokens")).otherwise(
                    F.lit(0.0)
                ),
                6,
            ).alias("top_token_frac"),
            "dup_bigram_frac",
            "dup_trigram_frac",
        )
    )


def sample_thresholds(fractions: dict[str, float]) -> dict[str, int]:
    """Per-stratum keep thresholds on the 60-bit hash domain, computed
    driver-side in Python so BOTH engines compare against the identical
    integer literal (float→int rounding happens exactly once, here)."""
    return {s: int(f * (1 << 60)) for s, f in fractions.items()}


def sample_stratified(
    docs: DataFrame,
    fractions: dict[str, float],
    seed: int = 42,
    strat_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, stratum, u60) — deterministic per-stratum downsampling:
    keep doc iff h60(seed || ':' || doc_id) < fraction[stratum] * 2^60.
    Strata absent from `fractions` are dropped entirely (fraction 0).

    Pure row expression — ZERO shuffles, no RNG: the keep decision is a
    function of (doc_id, seed) alone, so it is reproducible across runs,
    engines, task retries, and cluster sizes (df.sample() is none of
    those). The per-stratum threshold integers are fixed driver-side
    literals (sample_thresholds), so the float→int boundary is identical
    in Spark and the SQL oracle."""
    th = sample_thresholds(fractions)
    u = h60_col(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
    stratum = F.col(strat_col)
    thr = F.lit(None).cast("long")
    for s, t in sorted(th.items()):
        thr = F.when(stratum == s, F.lit(t)).otherwise(thr)
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            stratum.alias("stratum"),
            u.alias("u60"),
            thr.alias("thr"),
        )
        .filter(F.col("u60") < F.col("thr"))
        .select("doc_id", "stratum", "u60")
    )


def pack_sequences(
    docs: DataFrame,
    budget_tokens: int = DEFAULT_SEQ_BUDGET,
    n_shards: int = DEFAULT_PACK_SHARDS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, shard, seq_id, n_tokens, seq_offset) — sequential-fill
    packing of documents into fixed-token-budget training sequences.
    Documents are hash-sharded into n_shards independent streams; within a
    shard (ordered by doc_id) each doc lands in sequence
    floor(tokens_before / budget) at offset tokens_before mod budget.
    Docs longer than the budget straddle sequence boundaries (the training
    loader splits them) — sequential-fill, not bin-packing, is what actual
    pretraining packers do because it is deterministic and single-pass.

    Scale shape: the only wide operation is one window per shard (a sort
    within each of n_shards hash partitions). Parallelism = n_shards —
    size it to the cluster, not the corpus; each shard's scan is
    sequential by construction (packing order IS the semantics). h60
    sharding keeps shard sizes balanced (no skew: doc ids hash uniformly)."""
    toks = nonempty_tokens(text_col)
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.pmod(h60_col(F.col(id_col).cast("string")), F.lit(n_shards)).cast("int").alias("shard"),
        F.size(toks).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return base.select(
        "doc_id",
        "shard",
        F.floor(cum_before / budget_tokens).cast("long").alias("seq_id"),
        "n_tokens",
        (cum_before % budget_tokens).cast("long").alias("seq_offset"),
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    mode: str = "flag",
) -> DataFrame:
    """Benchmark decontamination — remove (or flag) training documents that
    share any word ``n``-gram with an evaluation/benchmark corpus, the
    standard pretraining hygiene step (13-gram overlap is the widely
    published convention; this corpus's tokenizer semantics apply).

    ``mode='flag'`` returns every doc as (doc_id, n_hits, contaminated):
    n_hits = DISTINCT doc shingles also present in the benchmark shingle
    set. ``mode='drop'`` returns the clean subset of ``docs`` (all original
    columns) — never a silent drop: pair it with the flag output when
    lineage counts are needed.

    Scale: doc shingles are join-keyed against the DISTINCT benchmark
    shingle set — benchmark corpora are millions of shingles vs the
    corpus's trillions, so the join is a standard fine-grained-key hash
    join with the small side shuffled once (broadcast if it fits; left to
    AQE rather than forced, since 'benchmark' can legitimately be another
    corpus slice). Never all-pairs, never a regex scan per benchmark row.
    """
    if mode not in ("flag", "drop"):
        raise ValueError(f"mode must be 'flag' or 'drop', got {mode!r}")
    from igd_spark.dedup import shingles

    dsh = shingles(docs, n=n, text_col=text_col, id_col=id_col)
    # the benchmark's ids are never used (only its DISTINCT shingle set),
    # so don't require it to carry the training corpus's id column —
    # synthesize one for the shingles() call
    bench_ids = benchmark.withColumn("_bid", F.monotonically_increasing_id())
    bsh = (
        shingles(bench_ids, n=n, text_col=bench_text_col, id_col="_bid")
        .select("shingle")
        .distinct()
    )
    hits = (
        dsh.join(bsh, "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_hits"))
    )
    if mode == "drop":
        # name-based USING join: survives benchmark being a slice of docs
        # (expression joins hit AMBIGUOUS_REFERENCE on the shared lineage)
        contaminated_ids = hits.select(F.col("doc_id").alias(id_col))
        return docs.join(contaminated_ids, id_col, "left_anti")
    base = docs.select(F.col(id_col).alias("doc_id"))
    return base.join(hits, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
        (F.coalesce(F.col("n_hits"), F.lit(0)) > 0).alias("contaminated"),
    )


# (name, pattern, tag) — patterns stay in the Java∩RE2 shared regex subset
# (classes, quantifiers, \b, non-capturing groups; no lookaround, no
# backrefs) so Spark (Java) and any RE2 oracle replace identically.
# Applied IN ORDER, each over the previous replacement's output; SSN
# (3-2-4) before phone (3-3-4) keeps the disjoint shapes unambiguous.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def redact_pii(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    patterns: tuple[tuple[str, str, str], ...] = PII_PATTERNS,
) -> DataFrame:
    """(doc_id, clean_text, n_redacted) — PII scrubbing, the standard
    pretraining hygiene pass: emails, SSNs, phone numbers, and IPv4
    addresses replaced by typed tags, with the total match count kept as
    an audit column (a doc with n_redacted much higher than its length
    suggests a dump, not prose — a quality signal downstream filters use).

    Pure JVM `regexp_replace`/`regexp_count` expressions — one projection
    pass, no shuffle, no Python; at 100 TB this is a map-only stage that
    pipelines into the same scan as tokenization.  NULL text redacts to
    ''.  Detection is pattern-based (the C4/CCNet convention): it targets
    the high-volume formats, not NER-grade recall — swap `patterns` for
    the deployment's own taxonomy.
    """
    out = F.coalesce(F.col(text_col), F.lit(""))
    n = F.lit(0).cast("long")
    for _name, pat, tag in patterns:
        n = n + F.regexp_count(out, F.lit(pat)).cast("long")
        out = F.regexp_replace(out, pat, tag)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        out.alias("clean_text"),
        n.alias("n_redacted"),
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 128,
    overlap: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Fixed-size token chunking with overlap — the RAG / context-window
    prep staple: (doc_id, chunk_id, chunk_text, n_tokens), chunk i covering
    tokens [i·step, i·step + chunk_tokens) of the analyzer token stream,
    step = chunk_tokens − overlap.  The LAST chunk is the first one whose
    window reaches the end of the doc (no shorter-than-overlap tail
    duplicates); an empty/NULL doc yields no chunks.  chunk_text is the
    token-joined form (one space) — the same normalized stream every other
    operator here scores, so chunk postings == slice of doc postings.

    Scale: pure JVM expressions — one tokenize, one sequence/transform
    over the token ARRAY per doc (no shuffle at all, no Python), then one
    explode; output row count = Σ ceil-ish(n/step), each row carrying only
    its own slice."""
    if chunk_tokens < 1:
        raise ValueError(f"chunk_tokens must be >= 1, got {chunk_tokens}")
    if not (0 <= overlap < chunk_tokens):
        raise ValueError(
            f"overlap must be in [0, chunk_tokens), got {overlap}"
        )
    step = chunk_tokens - overlap
    # NULL text == empty doc (no chunks) — without the coalesce, size(NULL)
    # is NULL and the chunk-count arithmetic fabricates one NULL chunk
    toks = nonempty_tokens(F.coalesce(F.col(text_col), F.lit("")))
    n = F.size(toks)
    # number of chunks: 1 + ceil(max(n - chunk_tokens, 0) / step)
    n_chunks = F.when(n <= 0, F.lit(0)).otherwise(
        F.lit(1)
        + F.ceil(F.greatest(n - F.lit(chunk_tokens), F.lit(0)) / F.lit(step))
    ).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.slice(toks, i * step + 1, chunk_tokens),
    )
    exploded = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.when(n_chunks > 0, chunks).otherwise(
                F.array().cast("array<array<string>>")
            )
        ).alias("chunk_id", "_ctoks"),
    )
    return exploded.select(
        "doc_id",
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.array_join("_ctoks", " ").alias("chunk_text"),
        F.size("_ctoks").cast("int").alias("n_tokens"),
    )


def mix_fractions(
    counts: dict[str, int], target: dict[str, float]
) -> dict[str, float]:
    """Per-stratum keep fractions that resample observed ``counts`` to the
    ``target`` mixture WITHOUT upsampling: with weights normalised to sum
    1, the largest feasible output size is T = min_s(n_s / w_s) (the
    stratum that runs out first pins the total), and each stratum keeps
    f_s = w_s * T / n_s (== 1.0 exactly for the pinning stratum).

    Driver-side pure function so the float arithmetic happens ONCE, in
    one place, with a fixed operation order — the SQL oracle evaluates
    the same formula in IEEE double and lands on bit-identical fractions.
    Strata in ``target`` but absent from ``counts`` are ignored; strata
    in ``counts`` but not in ``target`` get fraction 0 (dropped)."""
    tgt = {s: w for s, w in target.items() if s in counts and w > 0}
    if not tgt:
        raise ValueError("target must weight at least one present stratum")
    z = sum(tgt.values())
    t_total = min(counts[s] / (w / z) for s, w in tgt.items())
    return {s: (w / z) * t_total / counts[s] for s, w in tgt.items()}


def resample_to_mix(
    docs: DataFrame,
    target: dict[str, float],
    seed: int = 42,
    strat_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, stratum, u60) — deterministic downsampling to a TARGET
    domain mixture: the data-mixing stage of a pretraining pipeline
    (rebalance crawl/code/books/reference to prescribed proportions, the
    DoReMi / Pile-style recipe applied at the corpus level).  ``target``
    maps stratum value → desired weight (any positive scale — normalised
    internally); the output is the LARGEST subset achieving those
    proportions with keep-only sampling (the scarcest stratum is kept
    in full, everything else thins toward it; no duplication).

    Composition of two existing disciplines: the per-stratum counts are
    one tiny hash agg (collected — #strata rows), fractions are computed
    once driver-side (mix_fractions), and the keep decision is
    `sample_stratified`'s pure h60 row expression — zero shuffles on the
    corpus path, reproducible across runs, engines, retries, and cluster
    sizes.  At 100 TB the count agg is map-side-combined to #strata rows
    and everything else stays embarrassingly parallel."""
    counts = {
        r["s"]: r["n"]
        for r in docs.groupBy(F.col(strat_col).alias("s"))
        .agg(F.count("*").alias("n"))
        .collect()
        if r["s"] is not None
    }
    fractions = mix_fractions(counts, target)
    return sample_stratified(
        docs, fractions, seed=seed, strat_col=strat_col, id_col=id_col
    )


def train_holdout_split(
    docs: DataFrame,
    holdout_frac: float = 0.01,
    seed: int = 42,
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, split) — deterministic train/holdout assignment by hashed
    doc id: split = 'holdout' iff h60(seed:doc_id) < frac·2^60, else
    'train'.  The last stage of every pretraining-data pipeline: the
    holdout must be (a) disjoint, (b) reproducible run-to-run and
    machine-to-machine (no RNG state, no sampling order dependence — the
    assignment is a pure function of (seed, doc_id)), and (c) stable
    under corpus growth: adding new docs never moves an existing doc
    across the boundary, so yesterday's eval set is still untouched by
    today's training run.  Change ``seed`` to draw a fresh, independent
    boundary.

    Scale: one zero-shuffle JVM projection (md5 + compare); no count, no
    sort, no sampling pass.  Compose with `sample_stratified` when the
    holdout must hit per-domain quotas instead of a global fraction."""
    if not 0.0 <= holdout_frac <= 1.0:
        raise ValueError(f"holdout_frac must lie in [0, 1], got {holdout_frac}")
    thr = int(holdout_frac * float(1 << 60))
    u = h60_col(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.when(u < F.lit(thr), F.lit("holdout"))
        .otherwise(F.lit("train"))
        .alias("split"),
    )


# ---------------------------------------------------------------------------
# DSIR — Data Selection via Importance Resampling (Xie et al., NeurIPS 2023).
# Public algorithm: represent each document by hashed n-gram (unigram +
# bigram) features, fit bag-of-buckets multinomials over a TARGET corpus
# (the high-quality distribution you want more of) and the RAW corpus (the
# web-scale pool being filtered), and weight every raw document by its
# per-feature log-likelihood ratio.  Selecting the top-weighted documents
# shifts the training mixture toward the target domain without a learned
# classifier — the standard cheap data-selection stage between dedup and
# packing in a pretraining pipeline.


def _dsir_grams(toks: Column) -> Column:
    """Unigrams + space-joined bigrams of a token array (the DSIR feature
    set).  size<2 must be guarded: Spark's sequence(1, 0) DESCENDS (same
    pitfall as _span_array)."""
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(toks, bigrams)


def dsir_weights(
    docs: DataFrame,
    target_source: str,
    n_buckets: int = 8192,
    alpha: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    round_dp: int | None = 6,
) -> DataFrame:
    """(doc_id, n_feats, logw) — per-document DSIR importance weight.

    Features are unigram+bigram tokens hashed into ``n_buckets`` buckets
    with the engine's cross-engine h60 (deterministic across runs, engines
    and cluster sizes).  The target multinomial is fit on the documents
    whose ``source_col`` equals ``target_source``; the raw multinomial on
    the whole input.  Both are Laplace-smoothed with ``alpha`` so buckets
    unseen in the target stay finite:

        p[b] = (count[b] + alpha) / (total + alpha * n_buckets)
        logw(doc) = sum over the doc's feature occurrences of
                    ln p_target[bucket] - ln p_raw[bucket]

    Documents with zero tokens emit no row (no features, no evidence).

    Scale: the gram table is derived ONCE and persisted (it feeds the
    bucket-count fit and the per-doc scoring join); the fit is a single
    hash agg onto at most ``n_buckets`` rows, so the log-ratio table is
    broadcast-sized BY CONSTRUCTION (n_buckets is a constant, not a
    data-dependent vocabulary — this is why DSIR hashes instead of
    interning), and the per-doc score is one map-side-combinable agg on
    doc_id.  Two passes over the grams, zero corpus self-joins, no
    Python.  Reference analog: the same fit-then-score two-pass shape as
    the stats sidecar + scorer (src/igd_create.c:70-111 feeding
    src/igd_search.c:454-534)."""
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")
    if alpha <= 0.0:
        raise ValueError(f"alpha must be positive (Laplace), got {alpha}")
    from igd_spark.session import spread_small_scan

    toks = nonempty_tokens(F.coalesce(F.col(text_col), F.lit("")))
    src = spread_small_scan(
        docs.select(F.col(id_col), F.col(source_col), F.col(text_col))
    )
    gb = src.select(
        F.col(id_col).alias("doc_id"),
        (F.col(source_col) == F.lit(target_source)).alias("is_t"),
        F.explode(_dsir_grams(toks)).alias("gram"),
    ).select(
        "doc_id",
        "is_t",
        F.pmod(h60_col(F.col("gram")), F.lit(n_buckets)).alias("bucket"),
    )
    gb = gb.persist()
    bc = gb.groupBy("bucket").agg(
        F.count("*").cast("long").alias("c_r"),
        F.sum(F.col("is_t").cast("long")).alias("c_t"),
    )
    denom = F.lit(float(alpha * n_buckets))
    totals = bc.agg(
        F.sum("c_r").alias("t_r"), F.sum("c_t").alias("t_t")
    )
    lr = bc.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (
            F.log((F.col("c_t") + F.lit(alpha)) / (F.col("t_t") + denom))
            - F.log((F.col("c_r") + F.lit(alpha)) / (F.col("t_r") + denom))
        ).alias("lr"),
    )
    out = gb.join(F.broadcast(lr), "bucket").groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_feats"),
        F.sum("lr").alias("logw"),
    )
    if round_dp is not None:
        out = out.withColumn("logw", F.round("logw", round_dp))
    from igd_spark.dedup import _materialize_then_unpersist

    return _materialize_then_unpersist(out, [gb])


def dsir_select(
    docs: DataFrame,
    target_source: str,
    n: int,
    n_buckets: int = 8192,
    alpha: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    round_dp: int | None = 6,
) -> DataFrame:
    """(rank, doc_id, logw) — the ``n`` documents DSIR keeps: top
    importance weights, deterministic tie-break (logw desc, doc_id asc).
    The paper resamples with Gumbel noise; the engine's contract is
    reproducibility across runs and cluster sizes, so selection is the
    deterministic top-n of the same weights (set a seeded hash jitter
    upstream if sampling diversity matters more than determinism).

    Scale: TakeOrderedAndProject top-n over the weight table (no global
    sort, no single-partition window on the corpus); rank is assigned on
    the n-row result."""
    if n <= 0:
        raise ValueError(f"n must be positive, got {n}")
    w = dsir_weights(
        docs,
        target_source,
        n_buckets=n_buckets,
        alpha=alpha,
        text_col=text_col,
        id_col=id_col,
        source_col=source_col,
        round_dp=round_dp,
    )
    top = w.orderBy(F.desc("logw"), F.asc("doc_id")).limit(int(n))
    rw = Window.orderBy(F.desc("logw"), F.asc("doc_id"))
    return top.select(
        F.row_number().over(rw).cast("int").alias("rank"), "doc_id", "logw"
    )
