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


def term_id_col(term: Column | str = "term") -> Column:
    """Dense-dictionary-free term id: 64-bit hash (SURVEY §2 B4 — replaces the
    khash string→int interning, src/igd_base.c:122-145, with a stateless hash
    so no global dictionary pass is needed at 10^12-turn scale)."""
    c = F.col(term) if isinstance(term, str) else term
    return F.xxhash64(c)
