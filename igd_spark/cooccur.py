"""Co-occurrence matrix — the `igd search -m` hitsmap analog.

The reference's getMap computes an N×N dataset-by-dataset overlap-count
matrix by self-joining every tile's records (src/igd_search.c:772-826, with
the running-max-end early exit at :790-812). The text analog: how often do
two terms co-occur in the same document / two sources share identical
content. Both are self-joins on a fine-grained key (doc_id / content hash)
followed by a pair-count aggregation — never an unkeyed cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from igd_spark.config import DEFAULT_CONF, IndexConf
from igd_spark.tokenizer import postings


def term_cooccurrence(
    docs: DataFrame,
    min_df: int = 1,
    min_tf: int = 0,
    max_doc_terms: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
    conf: IndexConf = DEFAULT_CONF,
) -> DataFrame:
    """(term_a, term_b, n_docs) — number of documents containing both terms,
    term_a < term_b, restricted to terms with df ≥ min_df (the hot-cell
    guard: at corpus scale the matrix is only materialized for a bounded
    vocabulary slice; cold terms are pruned BEFORE the self-join, exactly
    like the -v value filter prunes before scanning, src/igd_search.c:644-656).

    min_tf > 0 is the value-filtered hitsmap (getMap_v analog,
    src/igd_search.c:829-886): only postings with tf ≥ min_tf participate,
    pushed below the self-join like the reference's per-record value test.

    max_doc_terms > 0 caps each document's contribution to its top-N terms
    by (tf desc, term asc — deterministic tie-break) BEFORE the self-join.
    This is the scale-policy bound the reference doesn't need (its hitsmap
    is N_datasets², trivially tiny; this text analog is per-doc quadratic):
    the self-join intermediate is Σ_docs min(t_d, N)² ≤ corpus_postings · N
    rows instead of Σ_docs t_d² — at 10^12 turns with t_d ≈ 40 distinct
    terms/turn, uncapped min_df=1 would be ~1.6·10^15 pair rows, while
    N = 32 bounds it to ≤ 3.2·10^13 ≈ one corpus-sized shuffle per 32× —
    sized by policy, not by the caller's luck with min_df. Capping changes
    semantics (it is a per-doc top-N co-occurrence matrix); min_df is then
    computed over the SURVIVING capped postings, so the two guards compose.
    Sizing rule when uncapped: keep min_df ≥ corpus_postings / target_rows
    · avg_doc_terms (the df filter must shrink the frequent-postings table
    until Σ (freq terms per doc)² fits the shuffle budget)."""
    post = postings(docs, text_col=text_col, id_col=id_col, conf=conf)
    if min_tf > 0:
        post = post.filter(F.col("tf") >= min_tf)
    if max_doc_terms > 0:
        wd = Window.partitionBy("doc_id").orderBy(F.desc("tf"), F.asc("term"))
        post = (
            post.withColumn("_r", F.row_number().over(wd))
            .filter(F.col("_r") <= max_doc_terms)
            .drop("_r")
        )
    post = post.select("doc_id", "term")
    if min_df > 1:
        keep = post.groupBy("term").agg(F.count("*").alias("df")).filter(
            F.col("df") >= min_df
        ).select("term")
        # No broadcast hint: with a low min_df at corpus scale the keep-set
        # is vocab-sized, and F.broadcast would bypass AQE's size check and
        # OOM the driver. LEFT SEMI lets AQE pick broadcast when the set is
        # actually small and shuffle-hash otherwise.
        post = post.join(keep, "term", "left_semi")
    a = post.select("doc_id", F.col("term").alias("term_a"))
    b = post.select("doc_id", F.col("term").alias("term_b"))
    return (
        a.join(b, "doc_id")
        .filter(F.col("term_a") < F.col("term_b"))
        .groupBy("term_a", "term_b")
        .agg(F.count("*").cast("long").alias("n_docs"))
    )


def source_overlap_matrix(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    granularity: str = "shingle",
    shingle_n: int = 5,
) -> DataFrame:
    """(src_a, src_b, n_shared) — dataset×dataset overlap matrix, the
    src/igd_search.c:1004-1017 hitsmap analog with content identity replacing
    interval overlap. src_a < src_b; self-join on a fine-grained content key,
    never an unkeyed cross product.

    granularity="shingle" (default): n_shared = number of distinct word
    n-grams present in BOTH sources — detects cross-source boilerplate /
    partial duplication even when no document is byte-identical.
    granularity="exact": n_shared = number of document pairs with
    byte-identical text (md5 self-join) — the strict mode; zero on corpora
    without verbatim dups. Pair orientation is src-normalized
    (least/greatest), so each unordered source pair aggregates into ONE
    row with src_a <= src_b; the explicit diagonal (src_a == src_b) counts
    within-source duplicate pairs, matching the reference hitsmap's N×N
    shape."""
    if granularity == "shingle":
        from igd_spark.dedup import shingles

        sh = (
            shingles(docs, n=shingle_n, text_col=text_col, id_col=id_col)
            .join(
                docs.select(F.col(id_col).alias("doc_id"), F.col(source_col).alias("src")),
                "doc_id",
            )
            .select("src", "shingle")
            .distinct()
        )
        a = sh.select(F.col("src").alias("src_a"), "shingle")
        b = sh.select(F.col("src").alias("src_b"), "shingle")
        return (
            a.join(b, "shingle")
            .filter(F.col("src_a") < F.col("src_b"))
            .groupBy("src_a", "src_b")
            .agg(F.count("*").cast("long").alias("n_shared"))
        )
    if granularity != "exact":
        raise ValueError(granularity)
    h = docs.select(
        F.col(source_col).alias("src"),
        F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("chash"),
        F.col(id_col).alias("doc_id"),
    )
    a = h.select(F.col("src").alias("src_a"), "chash", F.col("doc_id").alias("doc_a"))
    b = h.select(F.col("src").alias("src_b"), "chash", F.col("doc_id").alias("doc_b"))
    # doc_a < doc_b dedups the unordered DOC pair; the SOURCE pair must then
    # be re-normalized (least/greatest) or a pair's count splits across
    # (A,B) and (B,A) rows whenever doc-id order disagrees with source order
    return (
        a.join(b, "chash")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            F.least("src_a", "src_b").alias("src_a"),
            F.greatest("src_a", "src_b").alias("src_b"),
        )
        .groupBy("src_a", "src_b")
        .agg(F.count("*").cast("long").alias("n_shared"))
    )


def write_hitsmap_csv(matrix: DataFrame, path: str) -> None:
    """Hitsmap CSV sink — the reference writes its N×N matrix as a CSV with
    one row per dataset (src/igd_search.c:1004-1017). Single-header CSV via
    the DataFrame writer; callers pass any (a, b, count) matrix DF."""
    matrix.coalesce(1).write.mode("overwrite").option("header", True).csv(path)
