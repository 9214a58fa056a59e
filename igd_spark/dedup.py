"""Deduplication operators — exact, n-gram Jaccard, MinHash+LSH, SimHash.

These are the training-data-pipeline siblings of the reference's identity
machinery: IGD dedups *physically duplicated* records at query time with the
first-tile-only rule (src/igd_search.c:496-530); a 100 TB text pipeline dedups
*semantically duplicated* documents at build time. All candidate generation
is join-based (no O(n^2) cross products in the scale path): exact dedup hashes
content, near-dup generators join on shared shingles / MinHash LSH bands /
SimHash bands, so each shuffle key is a content bucket — the same
"bin, then look only inside the bin" discipline as IGD's tile pruning
(src/igd_search.c:459-464).

Hashes are md5-derived (hashing.h60) so every operator has an exact DuckDB
oracle. Everything is pyspark.sql built-ins — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from igd_spark.hashing import h60_col
from igd_spark.textstats import hamming64, nonempty_tokens, simhash

DEFAULT_SHINGLE_N = 5
DEFAULT_N_HASHES = 16
DEFAULT_BAND_ROWS = 4  # 16 hashes / 4 rows = 4 bands


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, canonical_id, group_size, is_canonical) — exact dedup by
    content hash; canonical = min doc_id per group. One shuffle on the
    content hash (fine-grained key → no skew)."""
    h = docs.select(F.col(id_col).alias("doc_id"), F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("chash"))
    w = Window.partitionBy("chash")
    return h.select(
        "doc_id",
        F.min("doc_id").over(w).alias("canonical_id"),
        F.count("*").over(w).cast("long").alias("group_size"),
    ).withColumn("is_canonical", (F.col("doc_id") == F.col("canonical_id")))


def shingles(docs: DataFrame, n: int = DEFAULT_SHINGLE_N,
             text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, shingle) — DISTINCT word n-grams per document (space-joined).
    Docs with fewer than n tokens produce zero shingles."""
    from igd_spark.session import spread_small_scan

    toks = nonempty_tokens(text_col)
    # guard: sequence(1, 0) in Spark is DESCENDING [1, 0], so docs shorter
    # than n tokens must short-circuit to an empty array, not an empty range
    sh = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # per-doc dedup is LOCAL (array_distinct inside the row) — the output
    # rows are then unique by construction, so no corpus-wide DISTINCT
    # shuffle is needed (was a full exchange of the shingle table)
    src = spread_small_scan(docs.select(F.col(id_col).alias("doc_id"), F.col(text_col)))
    return src.select("doc_id", F.explode(F.array_distinct(sh)).alias("shingle"))


def _materialize_then_unpersist(result: DataFrame, staged: list[DataFrame]) -> DataFrame:
    """Eagerly materialize `result` into executor storage, then unpersist
    the staged intermediates its plan consumed. Returning a lazy plan over
    persisted intermediates leaked their cached storage across repeated
    calls (nothing ever unpersisted them); materializing the (small) pair
    result first makes the unpersist safe. The returned DataFrame is
    cached — callers that loop over corpora own result.unpersist()."""
    result = result.persist()
    result.count()
    for df in staged:
        df.unpersist()
    return result


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    n: int = DEFAULT_SHINGLE_N,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_shingle_df: int | None = None,
) -> DataFrame:
    """(doc_a, doc_b, jaccard) — exact n-gram Jaccard over candidate pairs
    that share ≥1 shingle (join-generated, never all-pairs). jaccard =
    |A∩B| / (|A|+|B|-|A∩B|), rounded to 6 dp; doc_a < doc_b.

    max_shingle_df caps the document frequency of shingles admitted to the
    similarity space: without it one boilerplate shingle shared by 10^6 docs
    yields 10^12 candidate pairs (the scale-killer at 100 TB). Capped-space
    semantics: BOTH the intersection and the set sizes exclude hot shingles,
    so jaccard stays a true Jaccard over the reduced space (standard
    stopword-shingle treatment; deterministic, oracle-expressible).

    Capped path (max_shingle_df set): ONE groupBy(shingle) produces the
    sorted doc list, the df (the cap filter), and — by re-exploding the
    kept lists — the per-doc kept-shingle sizes; ordered pairs are
    enumerated in-row from each (bounded, <= cap) list. One shuffle of the
    shingle table total, where the join formulation shuffled it three
    times (df-cap semi-join, both self-join sides) plus a persisted
    materialization pass. The grouped table (one row per kept shingle) is
    what gets persisted. Without a cap a shingle's list is unbounded (the
    10^6-doc-array scale-killer), so the uncapped path keeps the
    join-generated form over the persisted exploded table.
    """
    sh = shingles(docs, n=n, text_col=text_col, id_col=id_col)
    if max_shingle_df is not None:
        g = (
            sh.groupBy("shingle")
            .agg(
                F.sort_array(F.collect_list("doc_id")).alias("ds"),
                F.count("*").alias("sdf"),
            )
            .filter(F.col("sdf") <= max_shingle_df)
            .persist()
        )
        g.count()  # materialize before fan-out
        sizes = (
            g.select(F.explode("ds").alias("doc_id"))
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_sh"))
        )
        inter = (
            g.select(
                F.explode(
                    F.expr(
                        "flatten(transform(ds, (x, i) -> "
                        "  transform(slice(ds, i + 2, size(ds)), "
                        "            y -> struct(x AS doc_a, y AS doc_b))))"
                    )
                ).alias("c")
            )
            .groupBy(F.col("c.doc_a").alias("doc_a"), F.col("c.doc_b").alias("doc_b"))
            .agg(F.count("*").alias("inter"))
        )
        staged = [g]
    else:
        sh = sh.persist()
        sh.count()  # materialize before fan-out (sizes + both join sides)
        sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
        a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
        b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
        inter = (
            a.join(b, "shingle")
            .filter(F.col("doc_a") < F.col("doc_b"))
            .groupBy("doc_a", "doc_b")
            .agg(F.count("*").alias("inter"))
        )
        staged = [sh]
    j = (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "na"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "nb"), "doc_b")
        .select(
            "doc_a", "doc_b",
            F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6).alias("jaccard"),
        )
    )
    return _materialize_then_unpersist(j.filter(F.col("jaccard") >= threshold), staged)


def _minhash_sig_arrays(
    docs: DataFrame,
    n_hashes: int = DEFAULT_N_HASHES,
    n: int = DEFAULT_SHINGLE_N,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, sig array<long>) — per-doc MinHash signature in seed order:
    sig[s] = min over the doc's shingles of h60('<s>|' + shingle).

    The wide-agg formulation: each seed is ONE map-side-combinable min
    aggregate, so the only shuffle carries n_hashes longs per doc — the
    long-format explode it replaces shuffled n_hashes ROWS per (doc,
    shingle) through the same exchange (16x the rows, measured ~2x the
    wall on the bench corpus)."""
    sh = shingles(docs, n=n, text_col=text_col, id_col=id_col)
    mins = [
        F.min(
            h60_col(F.concat(F.lit(f"{s}|"), F.col("shingle")))
        ).alias(f"_mh{s}")
        for s in range(n_hashes)
    ]
    return sh.groupBy("doc_id").agg(*mins).select(
        "doc_id", F.array(*[F.col(f"_mh{s}") for s in range(n_hashes)]).alias("sig")
    )


def minhash_signatures(
    docs: DataFrame,
    n_hashes: int = DEFAULT_N_HASHES,
    n: int = DEFAULT_SHINGLE_N,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, seed, mh) — long-format MinHash: mh = min over the doc's
    shingles of h60('<seed>|' + shingle). Domain-separated seeding keeps the
    oracle SQL arithmetic-free (no int64-overflowing mixers). Computed via
    the wide per-doc signature (one shuffle) and posexploded back to rows —
    identical output, 1/n_hashes-th the shuffled rows."""
    sigs = _minhash_sig_arrays(
        docs, n_hashes=n_hashes, n=n, text_col=text_col, id_col=id_col
    )
    return sigs.select("doc_id", F.posexplode("sig").alias("seed", "mh"))


def lsh_candidate_pairs(
    sigs: DataFrame, band_rows: int = DEFAULT_BAND_ROWS
) -> DataFrame:
    """(doc_a, doc_b) — distinct pairs whose signatures collide in ≥1 LSH
    band. Band key = concat of the band's mh values in seed order; the join
    key is (band_id, band_sig) so only same-bucket docs ever meet — the
    binning discipline of IGD's tile pruning, applied to content space."""
    bands = (
        sigs.withColumn("band_id", (F.col("seed") / band_rows).cast("int"))
        .groupBy("doc_id", "band_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("seed", "mh"))),
                    lambda x: x["mh"].cast("string"),
                ),
                ",",
            ).alias("band_sig")
        )
    )
    a = bands.select(F.col("doc_id").alias("doc_a"), "band_id", "band_sig")
    b = bands.select(F.col("doc_id").alias("doc_b"), "band_id", "band_sig")
    return (
        a.join(b, ["band_id", "band_sig"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def minhash_dedup_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    n_hashes: int = DEFAULT_N_HASHES,
    band_rows: int = DEFAULT_BAND_ROWS,
    n: int = DEFAULT_SHINGLE_N,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_a, doc_b, est_jaccard) — MinHash-LSH near-dup pairs: LSH bands
    generate candidates, the estimate = fraction of agreeing hash slots,
    filtered at `threshold`. Scale path of ngram_jaccard_pairs (candidate
    count is bucket-bounded, not shingle-df-bounded).

    The signature table (wide per-doc arrays) is persisted + materialized:
    it feeds the band join and both estimate join sides — unpersisted, the
    expensive shingle→min aggregation re-runs up to 3×. Band keys are
    sliced from the array in-row and the agreement estimate is one
    zip_with over the two arrays — no seed-level row expansion anywhere
    (the long-format pipeline this replaces shuffled 16 rows per doc into
    the band groupBy and 16 rows per candidate side into the estimate
    join)."""
    sigs = _minhash_sig_arrays(
        docs, n_hashes=n_hashes, n=n, text_col=text_col, id_col=id_col
    )
    sigs = sigs.persist()
    sigs.count()  # materialize before fan-out
    n_bands = -(-n_hashes // band_rows)
    # band key = comma-joined mh values in seed order — byte-identical to
    # the long-format array_sort(collect_list(struct(seed, mh))) key
    band_arr = F.transform(
        F.sequence(F.lit(0), F.lit(n_bands - 1)),
        lambda b: F.array_join(
            F.transform(
                F.slice(F.col("sig"), b * band_rows + 1, band_rows),
                lambda x: x.cast("string"),
            ),
            ",",
        ),
    )
    bands = sigs.select(
        "doc_id", F.posexplode(band_arr).alias("band_id", "band_sig")
    )
    a = bands.select(F.col("doc_id").alias("doc_a"), "band_id", "band_sig")
    b = bands.select(F.col("doc_id").alias("doc_b"), "band_id", "band_sig")
    cand = (
        a.join(b, ["band_id", "band_sig"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    sa = sigs.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"))
    agree = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda m: m
        )
    )
    est = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(agree / F.lit(n_hashes), 6).alias("est_jaccard"),
        )
    )
    return _materialize_then_unpersist(est.filter(F.col("est_jaccard") >= threshold), [sigs])


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 50,
) -> DataFrame:
    """(doc_id, component_id) for every node appearing in `pairs`, where
    component_id = the MIN doc id reachable through the undirected pair
    graph — the canonical label of the duplicate cluster.

    Min-label propagation: each iteration every node takes the minimum of
    its own label and its neighbors' labels (one join + one groupBy per
    iteration), converging in O(graph diameter) rounds. Near-dup graphs are
    star/clique-shaped (a cluster's members all collide with the same
    bucket contents), so diameter is tiny — typically 2-4 rounds; the
    classic large-star/small-star O(log n) variant (Kiveris et al., MapReduce
    CC) only pays off on adversarial long-path graphs that LSH buckets don't
    produce. Convergence is detected by the label-sum invariant: every
    non-converged round strictly lowers sum(label) (labels only decrease),
    so an unchanged sum IS the fixpoint — one cheap agg per round, no
    old-vs-new join. Lineage is truncated with localCheckpoint each round
    (on a cluster job, set a reliable checkpoint dir and spark checkpoints
    land on HDFS/object storage instead).
    """
    edges = pairs.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
    # symmetrize: propagation must flow both directions of each pair
    edges = edges.union(edges.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    # pre-partition on the join key: every round joins labels on b, so a
    # keyed persisted layout lets each round reuse this exchange instead
    # of re-shuffling the (static) edge table per iteration
    edges = edges.repartition("b").persist()
    # lazy checkpoints: the convergence agg below is the action that
    # materializes each round's labels, so checkpoint + agg cost ONE job
    # per round (eager=True ran a separate materialization job first —
    # half of every round's wall at small graph sizes)
    labels = (
        edges.select(F.col("a").alias("doc_id")).distinct()
        .withColumn("component_id", F.col("doc_id"))
        .localCheckpoint(eager=False)
    )
    # decimal(38,0) sum: with 63-bit hash doc ids (the default id scheme)
    # a long sum overflows within a handful of labels, and Spark 4's
    # default ANSI mode turns that into a hard ArithmeticException
    _label_sum = F.sum(F.col("component_id").cast("decimal(38,0)"))
    prev_sum = labels.agg(_label_sum).collect()[0][0]
    converged = False
    for _ in range(max_iter):
        nbr = (
            edges.join(
                labels.select(
                    F.col("doc_id").alias("b"), F.col("component_id").alias("nbr_label")
                ),
                "b",
            )
            .groupBy("a")
            .agg(F.min("nbr_label").alias("min_nbr"))
        )
        labels = (
            labels.join(nbr.withColumnRenamed("a", "doc_id"), "doc_id", "left")
            .select(
                "doc_id",
                F.least(
                    F.col("component_id"), F.coalesce(F.col("min_nbr"), F.col("component_id"))
                ).alias("component_id"),
            )
            .localCheckpoint(eager=False)
        )
        cur_sum = labels.agg(_label_sum).collect()[0][0]
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    edges.unpersist()
    if not converged:
        # labels only decrease and are bounded below, so non-convergence in
        # max_iter means a genuinely deeper graph than the LSH-bucket shape
        # this is tuned for — silently returning split components would make
        # dedup_clusters mark several survivors per true cluster with no
        # signal, so fail loudly instead
        raise RuntimeError(
            f"connected_components did not converge in max_iter={max_iter} "
            "rounds (graph diameter exceeds the iteration budget); re-run "
            "with a larger max_iter"
        )
    return labels


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
) -> DataFrame:
    """(doc_id, component_id, cluster_size, is_survivor) over ALL documents —
    the end-to-end fuzzy-dedup decision: near-dup pairs (from
    minhash_dedup_pairs / ngram_jaccard_pairs / simhash_dedup_pairs) are
    closed into connected components, singletons become their own
    component, and the survivor of each cluster is its min doc id (the
    same canonical rule as exact_dedup, extended transitively). Filtering
    on is_survivor yields the deduplicated corpus.

    Cost shape at scale: the pair graph is tiny relative to the corpus
    (only colliding docs appear), so component closure runs on the small
    side; the corpus-sized work is one left join on doc_id + one window
    over component_id (fine-grained keys, no skew)."""
    comp = connected_components(pairs, a_col=a_col, b_col=b_col)
    out = (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(comp, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("component_id"), F.col("doc_id")).alias("component_id"),
        )
    )
    w = Window.partitionBy("component_id")
    return out.select(
        "doc_id",
        "component_id",
        F.count("*").over(w).cast("long").alias("cluster_size"),
        (F.col("doc_id") == F.min("doc_id").over(w)).alias("is_survivor"),
    )


def fuzzy_dedup_docs(
    docs: DataFrame,
    method: str = "minhash",
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    **kwargs,
) -> DataFrame:
    """The surviving documents themselves (all original columns) after
    end-to-end fuzzy dedup: candidate pairs via `method` ('minhash' |
    'jaccard' | 'simhash' — kwargs forwarded), connected-component
    closure, min-doc-id survivor per cluster. The fuzzy sibling of
    pipeline.curated_docs' exact-dup gate."""
    if method == "minhash":
        pairs = minhash_dedup_pairs(
            docs, threshold=threshold, text_col=text_col, id_col=id_col, **kwargs
        )
    elif method == "jaccard":
        pairs = ngram_jaccard_pairs(
            docs, threshold=threshold, text_col=text_col, id_col=id_col, **kwargs
        )
    elif method == "simhash":
        pairs = simhash_dedup_pairs(docs, text_col=text_col, id_col=id_col, **kwargs)
    else:
        raise ValueError(f"unknown method {method!r}")
    verdict = dedup_clusters(docs, pairs, id_col=id_col)
    # dedup_clusters materialized the component labels (localCheckpoint +
    # convergence actions), so the persisted pair table the minhash/jaccard
    # builders returned is no longer referenced — release it here instead
    # of leaking one cached pair-set per corpus into executor storage
    pairs.unpersist()
    keep = verdict.filter(F.col("is_survivor")).select(F.col("doc_id").alias(id_col))
    return docs.join(keep, id_col)


def simhash_dedup_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_bands: int = 4,
    bits: int = 32,
) -> DataFrame:
    """(doc_a, doc_b, hamming) — SimHash near-dup pairs with hamming ≤
    max_hamming, candidates via band join: split the sketch into n_bands
    bit-slices; any pair within hamming ≤ n_bands-1 shares ≥1 identical
    slice (pigeonhole), so the band join is lossless for max_hamming <
    n_bands. Never an all-pairs product."""
    if max_hamming >= n_bands:
        raise ValueError("pigeonhole soundness needs max_hamming < n_bands")
    sh = simhash(docs, text_col=text_col, id_col=id_col, bits=bits)
    slice_bits = bits // n_bands
    mask = (1 << slice_bits) - 1
    bands = sh.select(
        "doc_id", "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(n_bands - 1))).alias("band_id"),
    ).withColumn(
        "band_val",
        F.expr(f"shiftright(simhash, band_id * {slice_bits})").bitwiseAND(F.lit(mask)),
    )
    a = bands.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sh_a"), "band_id", "band_val")
    b = bands.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sh_b"), "band_id", "band_val")
    pairs = (
        a.join(b, ["band_id", "band_val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", hamming64("sh_a", "sh_b").cast("int").alias("hamming"))
        .distinct()
    )
    return pairs.filter(F.col("hamming") <= max_hamming)


# ---------------------------------------------------------------------------
# Exact-substring duplicate spans (Lee et al. 2022, "Deduplicating Training
# Data Makes Language Models Better" — the suffix-array dedup every large
# pretraining pipeline runs, here anchored on fixed-L token windows: any
# duplicated substring of >= min_len tokens is detected exactly, because every
# L-window inside it is itself duplicated; merging covered windows recovers
# the maximal duplicated region). The structural analog in the reference is
# IGD's physical duplication of spanning records into every tile they touch
# (src/igd_base.c:162-172) with query-time first-tile dedup
# (src/igd_search.c:496-530): the L-gram windows are the fixed-width tiles of
# the token axis, and the canonical-occurrence rule below is the same
# "first bin owns the record" discipline.
# ---------------------------------------------------------------------------

DEFAULT_DUP_SPAN_LEN = 8  # tokens; web-scale pipelines use ~50 BPE tokens


def _window_occurrences(
    docs: DataFrame, min_len: int, text_col: str, id_col: str
) -> DataFrame:
    """(doc_id, p, gh) — every min_len-token window of the analyzed token
    stream: 1-based start position p and the md5 digest (16-byte binary —
    hex is injective so grouping semantics are exactly the hex-string
    form's, at half the shuffle bytes) of the space-joined window.
    Pure JVM expressions (split + transform + md5)."""
    from igd_spark.session import spread_small_scan

    toks = nonempty_tokens(text_col)
    wins = F.when(
        F.size(toks) >= min_len,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (min_len - 1)),
            lambda i: F.struct(
                i.alias("p"),
                F.unhex(F.md5(F.concat_ws(" ", F.slice(toks, i, min_len)))).alias("gh"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<p:int,gh:binary>>"))
    src = spread_small_scan(docs.select(F.col(id_col).alias("doc_id"), F.col(text_col)))
    return src.select("doc_id", F.explode(wins).alias("w")).select(
        "doc_id", F.col("w.p").alias("p"), F.col("w.gh").alias("gh")
    )


def _dup_occurrences(occ: DataFrame) -> DataFrame:
    """(doc_id, p, mult, is_canonical) for occurrences of windows whose
    content appears >= 2 times in the corpus (across docs OR within one).
    One groupBy(gh) with map-side partial aggregation — the skew-safe shape
    when a boilerplate gram repeats 10^9 times — then a fine-keyed hash join
    back on gh (AQE splits residual hot keys). Never all-pairs: multiplicity
    is counted, not enumerated. Canonical occurrence = lexicographic min
    (doc_id, p) — the deterministic "first copy owns the content" rule."""
    agg = (
        occ.groupBy("gh")
        .agg(F.count("*").alias("mult"), F.min(F.struct("doc_id", "p")).alias("canon"))
        .filter(F.col("mult") >= 2)
    )
    return (
        occ.join(agg, "gh")
        .withColumn(
            "is_canonical",
            (F.col("doc_id") == F.col("canon.doc_id")) & (F.col("p") == F.col("canon.p")),
        )
        .select("doc_id", "p", "mult", "is_canonical")
    )


def _merge_spans(cov: DataFrame, min_len: int) -> DataFrame:
    """Gaps-and-islands merge of fixed-length windows [p, p+L-1] into maximal
    contiguous covered token spans — (doc_id, span_start, span_end, span_len),
    positions 1-based inclusive. One exchange on doc_id (both windows and the
    final groupBy reuse it)."""
    w = Window.partitionBy("doc_id").orderBy("p")
    prev_end = F.max(F.col("p") + (min_len - 1)).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    isl = cov.withColumn(
        "ni", F.when(F.col("p") > F.coalesce(prev_end, F.lit(-1)) + 1, 1).otherwise(0)
    ).withColumn("island", F.sum("ni").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    return (
        isl.groupBy("doc_id", "island")
        .agg(
            F.min("p").cast("int").alias("span_start"),
            (F.max("p") + (min_len - 1)).cast("int").alias("span_end"),
        )
        .select(
            "doc_id",
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).cast("int").alias("span_len"),
        )
    )


def _duplicate_spans_plan(
    docs: DataFrame,
    min_len: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    occ: DataFrame | None = None,
) -> DataFrame:
    """Lazy logical plan of duplicate_spans — no persist, no execution.
    Plan-assertion scripts use this so asserting the shape costs nothing;
    ``occ`` lets the public wrapper substitute its persisted window table."""
    if occ is None:
        occ = _window_occurrences(docs, min_len, text_col, id_col)
    return _merge_spans(_dup_occurrences(occ).select("doc_id", "p"), min_len)


def duplicate_spans(
    docs: DataFrame,
    min_len: int = DEFAULT_DUP_SPAN_LEN,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, span_start, span_end, span_len) — maximal token spans in which
    every position lies inside some min_len-token window whose content occurs
    >= 2 times in the corpus (cross-doc or within-doc). Token positions are
    1-based over the analyzed (lowercased, punctuation-split) token stream.

    Scale: two shuffles (gh agg+join, doc_id window) over the window table —
    the same asymptotics as tokenization itself; no pairwise enumeration, so
    a gram shared by 10^6 docs costs 10^6 rows, not 10^12. Returned frame is
    persisted (callers looping over corpora own .unpersist())."""
    if min_len < 2:
        raise ValueError("min_len must be >= 2")
    occ = _window_occurrences(docs, min_len, text_col, id_col).persist()
    occ.count()  # materialize before the groupBy/join fan-out
    spans = _duplicate_spans_plan(docs, min_len, text_col, id_col, occ=occ)
    return _materialize_then_unpersist(spans, [occ])


def duplicate_span_stats(
    docs: DataFrame,
    min_len: int = DEFAULT_DUP_SPAN_LEN,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_tokens, dup_tokens, n_spans, dup_ratio) for EVERY document
    (zero-filled when nothing is duplicated) — the per-doc contamination
    profile used to gate training corpora on duplicated-content fraction.
    Returned frame is persisted and materialized (the span table it consumed
    is released before return); callers looping over corpora own
    .unpersist()."""
    spans = duplicate_spans(docs, min_len=min_len, text_col=text_col, id_col=id_col)
    agg = spans.groupBy("doc_id").agg(
        F.sum("span_len").cast("int").alias("dup_tokens"),
        F.count("*").cast("int").alias("n_spans"),
    )
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(nonempty_tokens(text_col)).cast("int").alias("n_tokens"),
    )
    out = base.join(agg, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.coalesce("dup_tokens", F.lit(0)).cast("int").alias("dup_tokens"),
        F.coalesce("n_spans", F.lit(0)).cast("int").alias("n_spans"),
        F.when(
            F.col("n_tokens") > 0,
            F.round(F.coalesce("dup_tokens", F.lit(0)) / F.col("n_tokens"), 6),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_ratio"),
    )
    # materialize the stats BEFORE releasing the span table: unpersisting
    # first handed consumers a lazy plan that re-ran the whole dup-span
    # pipeline from the source on first use (r5 review finding)
    return _materialize_then_unpersist(out, [spans])


def remove_duplicate_text(
    docs: DataFrame,
    min_len: int = DEFAULT_DUP_SPAN_LEN,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, clean_text, n_removed) — Lee et al. removal: every occurrence
    of a duplicated >= min_len-token window EXCEPT the corpus-canonical one
    (min (doc_id, p)) contributes removal positions. A canonical occurrence
    survives whenever its positions are disjoint from the removal windows of
    OTHER overlapping duplicated grams; when they overlap, parts of the
    canonical copy go too — the same caveat as byte-range suffix-array
    removal, which this operator mirrors at token granularity. clean_text is
    the ANALYZED token stream re-joined with single spaces (the operator runs
    on tokens, as the suffix-array original does) — docs with nothing
    duplicated round-trip to their normalized token text.

    Scale: same two-shuffle shape as duplicate_spans; the final filter is a
    JVM higher-order function over the token array against the doc's own
    (few) removal spans — no token-level explode, no Python. The per-doc
    grouped span side is localCheckpoint-ed (eager) and the window table
    unpersisted before the corpus-wide join: the returned frame is lazy
    with NO CacheManager entry behind it — the checkpoint blocks are
    released by the ContextCleaner when the result is garbage-collected
    (same lifecycle, and same executor-loss caveat, as dedup_clusters'
    lineage truncation)."""
    if min_len < 2:
        raise ValueError("min_len must be >= 2")
    occ = _window_occurrences(docs, min_len, text_col, id_col).persist()
    occ.count()
    rem = _dup_occurrences(occ).filter(~F.col("is_canonical")).select("doc_id", "p")
    sp = (
        _merge_spans(rem, min_len)
        .groupBy("doc_id")
        .agg(F.collect_list(F.struct("span_start", "span_end")).alias("spans"))
        .localCheckpoint(eager=True)
    )
    occ.unpersist()
    return _apply_span_removal(docs, sp, text_col, id_col)


def _remove_duplicate_text_plan(
    docs: DataFrame,
    min_len: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Lazy logical plan of remove_duplicate_text — no persist, no
    checkpoint, no execution; for plan-assertion scripts."""
    occ = _window_occurrences(docs, min_len, text_col, id_col)
    rem = _dup_occurrences(occ).filter(~F.col("is_canonical")).select("doc_id", "p")
    sp = (
        _merge_spans(rem, min_len)
        .groupBy("doc_id")
        .agg(F.collect_list(F.struct("span_start", "span_end")).alias("spans"))
    )
    return _apply_span_removal(docs, sp, text_col, id_col)


def _apply_span_removal(
    docs: DataFrame, sp: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Join per-doc removal spans and drop covered token positions with a
    JVM higher-order filter (shared by the eager wrapper and the lazy
    plan twin)."""
    empty_spans = F.array().cast("array<struct<span_start:int,span_end:int>>")
    base = docs.select(F.col(id_col).alias("doc_id"), nonempty_tokens(text_col).alias("tl"))
    j = base.join(sp, "doc_id", "left").withColumn(
        "spans", F.coalesce("spans", empty_spans)
    )
    clean = F.filter(
        F.col("tl"),
        lambda t, i: ~F.exists(
            F.col("spans"),
            lambda s: (i + 1 >= s["span_start"]) & (i + 1 <= s["span_end"]),
        ),
    )
    return j.select(
        "doc_id",
        F.concat_ws(" ", clean).alias("clean_text"),
        (F.size("tl") - F.size(clean)).cast("int").alias("n_removed"),
    )
