"""Ranking evaluation — the ES ``_rank_eval`` API surface.

Given a ranked result set (what any `*_topk` operator returns) and a
table of relevance judgments, compute the standard IR quality metrics per
query: precision@k, recall@k, MRR@k, and NDCG@k (graded, the
Järvelin-Kekäläinen log2-discount formulation ES uses).  This is how a
search team closes the loop on every retrieval operator in this package —
tune BM25 k1/b, a rescore window, or synonym sets against a judged query
sample.

The reference engine has no evaluation surface (its output is overlap
counts); this is part of the Lucene/ES operational frame the fulltext
tier expects.

Scale: judgments are a curated sample (thousands of (query, doc, grade)
rows — always broadcastable); results are k rows per query.  Everything
here is one broadcast join + per-query hash aggs over k-bounded rows —
nothing corpus-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["rank_eval"]


def rank_eval(
    results: DataFrame,
    judgments: DataFrame,
    k: int = 10,
    relevant_grade: int = 1,
    round_dp: int | None = None,
) -> DataFrame:
    """Per-query ranking metrics — (query_id, n_retrieved, n_relevant,
    precision, recall, mrr, ndcg).

    ``results``: (query_id, rank, doc_id[, ...]) — 1-based ranks, the
    `rank_topk` output shape.  Rows with rank > ``k`` are ignored.
    ``judgments``: (query_id, doc_id, grade) — integer relevance grades;
    a doc with grade >= ``relevant_grade`` counts as relevant for the
    binary metrics (precision/recall/MRR); NDCG uses the full graded
    scale with gain 2^grade - 1.

    Definitions (the ES _rank_eval metrics):
      precision@k = relevant retrieved / retrieved (ES
        ``k``-normalization by actual retrieved count);
      recall@k    = relevant retrieved / all relevant for the query;
      MRR@k       = 1 / rank of the first relevant hit (0 if none);
      NDCG@k      = DCG@k / IDCG@k with DCG = Σ (2^grade - 1) /
        log2(rank + 1) and IDCG over the ideal (grade-desc) ordering of
        the query's judged docs, truncated at k.  Queries with no judged
        relevant docs get NDCG 0 (the ES convention).

    Queries present in ``results`` but with no judgments at all still get
    a row (all-zero metrics) — silence would read as "perfect".
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    res = results.select("query_id", "rank", "doc_id").filter(F.col("rank") <= k)
    # one rating per (query, doc) — duplicate judgment rows (two rater
    # files grading the same doc) take the MAX grade, the ES convention;
    # without this the left join below would fan out and inflate every
    # metric past 1.0
    j = (
        judgments.select(
            "query_id", "doc_id", F.col("grade").cast("int").alias("grade")
        )
        .groupBy("query_id", "doc_id")
        .agg(F.max("grade").alias("grade"))
    )
    rel = F.col("grade") >= int(relevant_grade)
    gain = F.pow(F.lit(2.0), F.col("grade")) - F.lit(1.0)
    disc = F.log2(F.col("rank").cast("double") + F.lit(1.0))

    hit = res.join(F.broadcast(j), ["query_id", "doc_id"], "left")
    per_q = hit.groupBy("query_id").agg(
        F.count("*").cast("long").alias("n_retrieved"),
        F.sum(F.when(rel, 1).otherwise(0)).cast("long").alias("n_rel_ret"),
        F.min(F.when(rel, F.col("rank"))).alias("first_rel_rank"),
        F.sum(F.when(F.col("grade").isNotNull(), gain / disc).otherwise(0.0)).alias(
            "dcg"
        ),
    )

    # per-query totals + ideal DCG from the judgments alone
    # ideal ordering: grade desc; doc_id asc tie-break keeps it
    # deterministic (ties have equal gain, so IDCG is unaffected)
    wi = F.row_number().over(
        Window.partitionBy("query_id").orderBy(F.desc("grade"), F.asc("doc_id"))
    )
    ideal = (
        j.withColumn("_ir", wi)
        .filter(F.col("_ir") <= k)
        .groupBy("query_id")
        .agg(
            F.sum(
                (F.pow(F.lit(2.0), F.col("grade")) - F.lit(1.0))
                / F.log2(F.col("_ir").cast("double") + F.lit(1.0))
            ).alias("idcg")
        )
    )
    totals = j.filter(rel).groupBy("query_id").agg(
        F.count("*").cast("long").alias("n_relevant")
    )

    out = (
        per_q.join(F.broadcast(totals), "query_id", "left")
        .join(F.broadcast(ideal), "query_id", "left")
        .select(
            "query_id",
            "n_retrieved",
            F.coalesce("n_relevant", F.lit(0)).alias("n_relevant"),
            (F.col("n_rel_ret") / F.col("n_retrieved")).alias("precision"),
            F.when(
                F.coalesce("n_relevant", F.lit(0)) > 0,
                F.col("n_rel_ret") / F.col("n_relevant"),
            )
            .otherwise(0.0)
            .alias("recall"),
            F.when(
                F.col("first_rel_rank").isNotNull(),
                F.lit(1.0) / F.col("first_rel_rank"),
            )
            .otherwise(0.0)
            .alias("mrr"),
            F.when(
                F.coalesce("idcg", F.lit(0.0)) > 0.0, F.col("dcg") / F.col("idcg")
            )
            .otherwise(0.0)
            .alias("ndcg"),
        )
    )
    if round_dp is not None:
        for c in ("precision", "recall", "mrr", "ndcg"):
            out = out.withColumn(c, F.round(c, round_dp))
    return out
