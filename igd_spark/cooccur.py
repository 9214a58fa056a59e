"""Co-occurrence matrix — the `igd search -m` hitsmap analog.

The reference's getMap computes an N×N dataset-by-dataset overlap-count
matrix by self-joining every tile's records (src/igd_search.c:772-826, with
the running-max-end early exit at :790-812). The text analog: how often do
two terms co-occur in the same document / two sources share identical
content. Both are self-joins on a fine-grained key (doc_id / content hash)
followed by a pair-count aggregation — never an unkeyed cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from igd_spark.config import DEFAULT_CONF, IndexConf
from igd_spark.tokenizer import postings


def term_cooccurrence(
    docs: DataFrame,
    min_df: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    conf: IndexConf = DEFAULT_CONF,
) -> DataFrame:
    """(term_a, term_b, n_docs) — number of documents containing both terms,
    term_a < term_b, restricted to terms with df ≥ min_df (the hot-cell
    guard: at corpus scale the matrix is only materialized for a bounded
    vocabulary slice; cold terms are pruned BEFORE the self-join, exactly
    like the -v value filter prunes before scanning, src/igd_search.c:644-656).
    """
    post = postings(docs, text_col=text_col, id_col=id_col, conf=conf).select("doc_id", "term")
    if min_df > 1:
        keep = post.groupBy("term").agg(F.count("*").alias("df")).filter(
            F.col("df") >= min_df
        ).select("term")
        post = post.join(F.broadcast(keep), "term")
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
) -> DataFrame:
    """(src_a, src_b, n_shared) — pairs of sources sharing byte-identical
    document content (content-hash self-join; src_a ≤ src_b includes the
    diagonal like the reference's hitsmap). The dataset×dataset matrix of
    src/igd_search.c:1004-1017, with content hash replacing interval
    overlap."""
    h = docs.select(
        F.col(source_col).alias("src"),
        F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("chash"),
        F.col(id_col).alias("doc_id"),
    )
    a = h.select(F.col("src").alias("src_a"), "chash", F.col("doc_id").alias("doc_a"))
    b = h.select(F.col("src").alias("src_b"), "chash", F.col("doc_id").alias("doc_b"))
    return (
        a.join(b, "chash")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count("*").cast("long").alias("n_shared"))
    )
