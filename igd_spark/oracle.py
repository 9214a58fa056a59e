"""Pure-python/numpy reference implementation of index build + BM25 top-k.

This is the rank-identity oracle required by BASELINE.json north_rule ("the
engine must return rank-identical top-k docIDs and BM25 scores versus the
reference implementation"). It is deliberately tiny and obviously correct —
the role the reference's manual end-to-end vignette played
(vignettes/using_igd.md:10-37), but automated.

Shared spec (FIXTURES.md §5): tokenizer = lowercase, split on non-alphanum
runs, drop empties. BM25: idf = ln((N - df + 0.5)/(df + 0.5) + 1),
score = Σ idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)),
ties broken (score desc, doc_id asc). k1=1.2, b=0.75 fixed.
"""

from __future__ import annotations

import math
import re
from collections import Counter
from dataclasses import dataclass

_TOKEN_RE = re.compile(r"[^a-z0-9]+")


def tokenize(text: str) -> list[str]:
    if text is None:
        return []
    return [t for t in _TOKEN_RE.split(text.lower()) if t]


@dataclass
class OracleIndex:
    postings: dict[str, dict[int, int]]  # term -> {doc_id: tf}
    dl: dict[int, int]                   # doc_id -> token count
    n_docs: int
    avgdl: float


def build_oracle_index(docs: list[tuple[int, str]]) -> OracleIndex:
    """docs: [(doc_id, text)]. Every doc counts toward N, even if empty."""
    postings: dict[str, dict[int, int]] = {}
    dl: dict[int, int] = {}
    for doc_id, text in docs:
        toks = tokenize(text)
        dl[doc_id] = len(toks)
        for term, tf in Counter(toks).items():
            postings.setdefault(term, {})[doc_id] = tf
    n = len(dl)
    avgdl = (sum(dl.values()) / n) if n else 0.0
    return OracleIndex(postings=postings, dl=dl, n_docs=n, avgdl=avgdl)


def idf(n_docs: int, df: int) -> float:
    return math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)


def bm25_topk(
    index: OracleIndex,
    query_text: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    min_tf: int = 0,
) -> list[tuple[int, float]]:
    """[(doc_id, score)] rank-ordered, ties (score desc, doc_id asc).

    Duplicate terms in the query are deduplicated (each distinct term scores
    once) — same convention in the engine and the SQL oracle. min_tf is the
    analog of the reference's value-threshold search `-v`
    (src/igd_search.c:623-694).
    """
    scores: dict[int, float] = {}
    # deterministic term order (sorted) so float accumulation order is fixed
    for term in sorted(set(tokenize(query_text))):
        plist = index.postings.get(term)
        if not plist:
            continue  # unknown term → 0 hits (src/igd_search.c:456-458 analog)
        t_idf = idf(index.n_docs, len(plist))
        for doc_id, tf in plist.items():
            if tf < min_tf:
                continue
            denom = tf + k1 * (1.0 - b + b * index.dl[doc_id] / index.avgdl)
            scores[doc_id] = scores.get(doc_id, 0.0) + t_idf * tf * (k1 + 1.0) / denom
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return ranked[:k]


def match_enumerate(index: OracleIndex, query_text: str) -> list[tuple[str, int, int]]:
    """Full-match enumeration (analog of igd search -f full overlaps,
    src/igd_search.c:537-620): [(term, doc_id, tf)] for all query terms."""
    out = []
    for term in sorted(set(tokenize(query_text))):
        for doc_id, tf in sorted(index.postings.get(term, {}).items()):
            out.append((term, doc_id, tf))
    return out
