"""Corpus curation — the composite training-data filter chain.

A 100 TB pretraining pipeline gates documents through dedup + language +
quality filters before tokenization; this operator composes the engine's
verified semantics (exact_dedup's canonical rule, lang_id's marker argmax,
text_stats' quality score) into one decision per document with a
deterministic reject reason — as a SINGLE-PASS plan: language and quality
are pure row expressions (no shuffle), duplicate detection is one window
over the content hash. One shuffle total, zero joins; at 10^12 docs the
only wide exchange is the fine-grained chash partition.

Reason precedence (first failing check wins): duplicate → language →
quality. A document is kept iff it is the canonical copy of its content
group, its predicted language is in `langs`, and its quality score ≥
`min_quality`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from igd_spark.textstats import lang_pred_col, quality_col

DEFAULT_MIN_QUALITY = 0.5
DEFAULT_LANGS = ("en",)


def curate(
    docs: DataFrame,
    min_quality: float = DEFAULT_MIN_QUALITY,
    langs: tuple[str, ...] = DEFAULT_LANGS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, keep, reason) — one verdict per document. reason is null
    for kept docs, else the FIRST failing gate in (duplicate, lang,
    quality)."""
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("chash"),
        lang_pred_col(text_col).alias("lang_pred"),
        quality_col(text_col).alias("quality"),
    )
    w = Window.partitionBy("chash")
    flagged = base.withColumn(
        "is_canonical", F.col("doc_id") == F.min("doc_id").over(w)
    )
    lang_arr = F.array(*[F.lit(l) for l in langs])
    reason = (
        F.when(~F.col("is_canonical"), F.lit("duplicate"))
        .when(~F.array_contains(lang_arr, F.col("lang_pred")), F.lit("lang"))
        .when(F.col("quality") < min_quality, F.lit("quality"))
        .otherwise(F.lit(None).cast("string"))
    )
    return flagged.select(
        "doc_id",
        reason.isNull().alias("keep"),
        reason.alias("reason"),
    )


def curated_docs(
    docs: DataFrame,
    min_quality: float = DEFAULT_MIN_QUALITY,
    langs: tuple[str, ...] = DEFAULT_LANGS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The surviving documents themselves (all original columns)."""
    verdict = curate(
        docs, min_quality=min_quality, langs=langs, text_col=text_col, id_col=id_col
    )
    keep = verdict.filter(F.col("keep")).select(F.col("doc_id").alias(id_col))
    return docs.join(keep, id_col)
