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


def field_caps(
    docs: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """The ES ``_field_caps`` API over a transcripts/documents table: one
    row per column — (field, es_type, searchable, aggregatable,
    non_null_count), field asc.  The mapping mirrors ES semantics: the
    analyzed body column (``text_col``) is type ``text`` (searchable,
    NOT aggregatable — ES refuses to aggregate analyzed text); every
    other string column is a ``keyword`` (searchable AND aggregatable —
    the filter/facet/collapse fields); numeric, boolean and timestamp
    columns map to their ES scalar type (aggregatable, not
    full-text-searchable).  ``non_null_count`` is the per-field doc
    coverage — what the `exists` query would match, the data-dependent
    half ES surfaces via ``index_filter``.

    Scale: ONE corpus pass computing every column's count(col) in a
    single map-side-combinable aggregate row (no per-field jobs, no
    shuffle beyond the 1-row final combine); the schema half is pure
    driver-side reflection.
    """
    def es_type(dt: str, name: str) -> str:
        if name == text_col:
            return "text"
        if dt == "string":
            return "keyword"
        if dt in ("int", "integer"):
            return "integer"
        if dt in ("bigint", "long"):
            return "long"
        if dt == "double":
            return "double"
        if dt == "float":
            return "float"
        if dt == "boolean":
            return "boolean"
        if dt.startswith("timestamp"):
            return "date"
        return dt

    fields = sorted(
        (f.name, es_type(f.dataType.simpleString(), f.name))
        for f in docs.schema.fields
    )
    counts = docs.agg(
        *[F.count(F.col(name)).cast("long").alias(name) for name, _ in fields]
    )
    # unpivot the 1-row aggregate (ONE corpus pass total), then attach the
    # driver-known type mapping as literal CASE branches — no re-aggregation
    pairs: list = []
    for name, _ in fields:
        pairs.extend([F.lit(name), F.col(name)])
    long = counts.select(
        F.explode(F.create_map(*pairs)).alias("field", "non_null_count")
    )
    et_col = F.lit(None).cast("string")
    for name, et in reversed(fields):
        et_col = F.when(F.col("field") == name, F.lit(et)).otherwise(et_col)
    return long.select(
        "field",
        et_col.alias("es_type"),
        et_col.isin("text", "keyword").alias("searchable"),
        (et_col != "text").alias("aggregatable"),
        F.col("non_null_count").cast("long").alias("non_null_count"),
    ).orderBy("field")


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
