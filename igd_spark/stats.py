"""Collection statistics — the analog of the reference's `_index.tsv` sidecar
(`Index, File, Number of regions, Avg size`, src/igd_create.c:96-110; parsed by
get_fileinfo, src/igd_base.c:235-267). nr/md there are per-dataset cardinality
and mean width — exactly the doc-length / avgdl statistics BM25 needs.

All three are plain hash aggregations with map-side partial aggregation
(the distributed form of the reference's inline `nr[ig]++; avg[ig]+=en-st`
accumulators, src/igd_create.c:70-72).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from igd_spark.config import DEFAULT_CONF, IndexConf
from igd_spark.tokenizer import token_count_col


def doc_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    conf: IndexConf = DEFAULT_CONF,
) -> DataFrame:
    """(doc_id, dl) for EVERY document, including zero-token ones.

    Computed straight off the docs table with an array-size expression —
    no explode, no shuffle beyond the source partitioning.
    """
    return docs.select(
        F.col(id_col).alias("doc_id"),
        token_count_col(
            F.col(text_col), conf.token_split_re,
            conf.stopwords, conf.min_token_len,
        ).cast("int").alias("dl"),
    )


def corpus_stats(doc_stats_df: DataFrame) -> DataFrame:
    """Single row (n_docs, avgdl). N counts all docs (empty included); avgdl =
    total tokens / N — shared definition with oracle + SQL."""
    return doc_stats_df.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl") / F.count("*")).cast("double").alias("avgdl"),
        F.coalesce(F.sum("dl"), F.lit(0)).cast("long").alias("sum_dl"),
    )


def term_stats(postings_df: DataFrame) -> DataFrame:
    """(term, df) — document frequency. One row per distinct term; at corpus
    scale this is ~vocab-sized (millions), small enough to broadcast the
    query-relevant slice at search time."""
    return postings_df.groupBy("term").agg(F.count("*").cast("long").alias("df"))


def term_vectors(
    docs: DataFrame,
    doc_ids: DataFrame,
    conf: IndexConf = DEFAULT_CONF,
    text_col: str = "text",
    id_col: str = "doc_id",
    dictionary: DataFrame | None = None,
) -> DataFrame:
    """Per-document term vectors — the ES ``_termvectors`` API: for each
    requested doc, its (term, tf) pairs plus the term's index-global df and
    the doc's length — (doc_id, term, tf, df, dl).  ``doc_ids`` is a
    one-column (doc_id) DataFrame.

    ``dictionary``: optional (term, df, ...) frame — pass a persisted
    index's ``idx.dictionary`` so df comes from the vocab-sized sidecar
    instead of a corpus-wide postings pass.  Without it, df is computed
    from the full corpus (exactly what ES stores per segment; here it's
    one postings aggregation).

    Scale: the requested docs are filtered BEFORE tokenization (doc_id
    pushdown on the corpus scan), so per-doc work is bounded by the
    request; only the df side is corpus-sized, and the ``dictionary``
    parameter removes it.
    """
    from igd_spark.tokenizer import postings as _postings

    ids = doc_ids.select(F.col(doc_ids.columns[0]).alias("doc_id"))
    wanted = docs.join(
        F.broadcast(ids), docs[id_col] == ids["doc_id"], "left_semi"
    )
    tv = _postings(wanted, text_col=text_col, id_col=id_col, conf=conf)
    if dictionary is not None:
        df_side = dictionary.select("term", F.col("df").cast("long").alias("df"))
    else:
        df_side = term_stats(_postings(docs, text_col=text_col, id_col=id_col, conf=conf))
    dls = doc_stats(wanted, text_col=text_col, id_col=id_col, conf=conf)
    return (
        tv.join(df_side, "term")
        .join(F.broadcast(dls), "doc_id")
        .select("doc_id", "term", F.col("tf").cast("int").alias("tf"),
                F.col("df").cast("long").alias("df"),
                F.col("dl").cast("int").alias("dl"))
    )
