"""Tokenization and postings extraction.

Analog of the reference's input parser + insert path: parse_bed
(src/igd_base.c:53-72) splits a line into (chrm, start, end); igd_add
(src/igd_base.c:118-174) bins it and appends a 16-byte record. Here the
"parse" is tokenization of the ``text`` column and the record is a posting
``(term, doc_id, tf)``.

Deliberately *not* a pandas UDF: lowercase/regex-split/explode/count are all
JVM-side built-ins (whole-stage codegen, no Python in the hot build path) —
strictly faster than the Arrow round-trip SURVEY §2 S3 contemplated. The spec
is shared with the pure-python oracle and the DuckDB oracle SQL
(FIXTURES.md §5): lowercase, split on non-alphanumeric runs, drop empties.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from igd_spark.config import DEFAULT_CONF, IndexConf

TOKEN_SPLIT_RE = DEFAULT_CONF.token_split_re


def tokens_col(text: Column | str, split_re: str = TOKEN_SPLIT_RE) -> Column:
    """array<string> of tokens; may contain '' at boundaries (filter after
    explode so the filter stays a cheap scalar predicate)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.lower(c), split_re)


def token_count_col(text: Column | str, split_re: str = TOKEN_SPLIT_RE) -> Column:
    """Number of non-empty tokens, without exploding (for doc_stats fast path)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.filter(tokens_col(c, split_re), lambda t: t != F.lit("")))


def postings(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    conf: IndexConf = DEFAULT_CONF,
) -> DataFrame:
    """(doc_id, term, tf) — one row per distinct term per document.

    The groupBy key (doc_id, term) is fine-grained, so the Zipf head does NOT
    skew this shuffle; partial (map-side) aggregation makes the shuffle carry
    at most one row per distinct (doc, term). Skew is handled later, at
    segment-packing time (build.py salting).
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens_col(F.col(text_col), conf.token_split_re)).alias("term"),
    ).filter(F.col("term") != "")
    return toks.groupBy("doc_id", "term").agg(F.count("*").cast("int").alias("tf"))


def postings_spimi(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    conf: IndexConf = DEFAULT_CONF,
) -> DataFrame:
    """(doc_id, term, tf, dl) — SPIMI-style per-partition posting builder
    (BASELINE.json north_star). tf and dl are doc-local quantities, so they
    are computed entirely inside one Arrow-batched kernel with ZERO shuffle:
    the JVM explode+groupBy path shuffles ~|postings| rows to aggregate
    something each partition already knows. This is the exact structural
    analog of the reference's in-memory per-batch tile accumulation before
    any disk round-trip (igd_add + igd_saveT, src/igd_base.c:118-174,
    333-364): the shuffle happens once, later, at segment packing.

    Emits dl (doc token count) denormalized onto every posting — the
    gdata_t.value-rides-in-every-record discipline (src/igd_base.h:45) —
    so the segment packer never joins doc_stats.

    Semantics identical to postings() (tested); tokenizer spec shared with
    the oracle: lowercase, split on non-alphanum runs, drop empties.
    """
    import re

    import pandas as pd

    from pyspark.sql import types as T

    split_re = re.compile(conf.token_split_re)
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("term", T.StringType(), False),
            T.StructField("tf", T.IntegerType(), False),
            T.StructField("dl", T.IntegerType(), False),
        ]
    )

    def kernel(it):
        for pdf in it:
            if not len(pdf):
                continue
            texts = pdf[text_col].fillna("").str.lower()
            toks = texts.str.split(split_re)
            s = pd.DataFrame({"doc_id": pdf[id_col], "term": toks}).explode("term")
            s = s[(s["term"].notna()) & (s["term"] != "")]
            if not len(s):
                continue
            g = s.groupby(["doc_id", "term"], sort=False).size().reset_index(name="tf")
            dl = g.groupby("doc_id", sort=False)["tf"].sum().rename("dl")
            g = g.join(dl, on="doc_id")
            yield pd.DataFrame(
                {
                    "doc_id": g["doc_id"].astype("int64"),
                    "term": g["term"],
                    "tf": g["tf"].astype("int32"),
                    "dl": g["dl"].astype("int32"),
                }
            )

    src = docs.select(id_col, text_col)
    # cap concurrent tokenize kernels on a single-memory-bus local master
    # (coalesce = no shuffle, just fewer/fatter scan tasks); no-op on a
    # cluster or when the scan is already narrower than the cap
    from igd_spark.session import kernel_parallelism

    n_in = src.rdd.getNumPartitions()
    n_eff = kernel_parallelism(docs.sparkSession, n_in)
    if n_eff < n_in:
        src = src.coalesce(n_eff)
    return src.mapInPandas(kernel, schema=out_schema)


def occurrences_spimi(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    conf: IndexConf = DEFAULT_CONF,
) -> DataFrame:
    """(doc_id, term, pos) — one row per token OCCURRENCE with its dense
    0-based position, computed entirely inside an Arrow kernel with ZERO
    shuffle (positions are doc-local, exactly like tf/dl in
    postings_spimi). This is the build-side source of the persistent
    positional index (store_positions) — the reference keeps its
    start-coordinate axis in every stored record (src/igd_base.h:41-46);
    here the token position is that coordinate.

    Position semantics shared with search.positional_postings (tested
    identical): index within the doc's NON-EMPTY token sequence.
    """
    import re

    import pandas as pd

    from pyspark.sql import types as T

    split_re = re.compile(conf.token_split_re)
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("term", T.StringType(), False),
            T.StructField("pos", T.IntegerType(), False),
        ]
    )

    def kernel(it):
        for pdf in it:
            if not len(pdf):
                continue
            texts = pdf[text_col].fillna("").str.lower()
            toks = texts.str.split(split_re)
            s = pd.DataFrame({"doc_id": pdf[id_col], "term": toks}).explode("term")
            s = s[(s["term"].notna()) & (s["term"] != "")]
            if not len(s):
                continue
            # dense position = rank within the doc's surviving occurrences;
            # explode preserves source order, so a per-doc cumcount is it
            s["pos"] = s.groupby("doc_id", sort=False).cumcount()
            yield pd.DataFrame(
                {
                    "doc_id": s["doc_id"].astype("int64"),
                    "term": s["term"],
                    "pos": s["pos"].astype("int32"),
                }
            )

    src = docs.select(id_col, text_col)
    from igd_spark.session import kernel_parallelism

    n_in = src.rdd.getNumPartitions()
    n_eff = kernel_parallelism(docs.sparkSession, n_in)
    if n_eff < n_in:
        src = src.coalesce(n_eff)
    return src.mapInPandas(kernel, schema=out_schema)


def term_id_col(term: Column | str = "term") -> Column:
    """Dense-dictionary-free term id: 64-bit hash (SURVEY §2 B4 — replaces the
    khash string→int interning, src/igd_base.c:122-145, with a stateless hash
    so no global dictionary pass is needed at 10^12-turn scale)."""
    c = F.col(term) if isinstance(term, str) else term
    return F.xxhash64(c)
