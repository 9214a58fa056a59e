"""BM25 scoring expressions shared by the exact and indexed scorers.

Formula (fixed k1/b per BASELINE.json north_star; identical in oracle.py and
in the DuckDB oracle SQL):
    idf(t)      = ln((N - df_t + 0.5) / (df_t + 0.5) + 1)
    w(t, d)     = idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * dl_d / avgdl))
    score(q, d) = Σ_{t ∈ distinct terms of q} w(t, d)
Ties broken (score desc, doc_id asc) — required for rank identity (Q11 analog:
the reference returns all counts, top-k is the graft addition, SURVEY §2 Q11).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def idf_col(n_docs: Column | int, df: Column | str = "df") -> Column:
    n = F.lit(n_docs) if isinstance(n_docs, int) else n_docs
    d = F.col(df) if isinstance(df, str) else df
    return F.log((n - d + F.lit(0.5)) / (d + F.lit(0.5)) + F.lit(1.0))


def bm25_weight_col(
    idf: Column,
    tf: Column | str,
    dl: Column | str,
    avgdl: Column | float,
    k1: float = 1.2,
    b: float = 0.75,
) -> Column:
    tfc = F.col(tf) if isinstance(tf, str) else tf
    dlc = F.col(dl) if isinstance(dl, str) else dl
    a = F.lit(avgdl) if isinstance(avgdl, float) else avgdl
    denom = tfc + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dlc / a)
    return idf * tfc * F.lit(k1 + 1.0) / denom
