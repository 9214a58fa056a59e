"""Randomized cross-check of the duplicate-span family against a pure-Python
oracle implementing the same semantics (window multiplicity, coverage
islands, canonical-occurrence removal), plus structural invariants. Small
vocabularies make duplicated windows dense, so every code path is exercised.
"""

from __future__ import annotations

import random
import re
from collections import defaultdict

import pytest

from igd_spark import duplicate_span_stats, duplicate_spans, remove_duplicate_text

L = 5
VOCAB = [f"w{i}" for i in range(10)]


def _toks(text: str) -> list[str]:
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def _py_oracle(docs: list[tuple[int, str]], min_len: int):
    """Returns (spans, stats, cleaned) exactly as the operators define them."""
    toks = {d: _toks(t) for d, t in docs}
    occ: dict[str, list[tuple[int, int]]] = defaultdict(list)
    for d, tl in sorted(toks.items()):
        for p in range(1, len(tl) - min_len + 2):
            occ[" ".join(tl[p - 1 : p - 1 + min_len])].append((d, p))

    def cover(position_sets: dict[int, set[int]]):
        spans = set()
        for d, starts in position_sets.items():
            covered: set[int] = set()
            for p in starts:
                covered.update(range(p, p + min_len))
            for pos in sorted(covered):
                if pos - 1 not in covered:
                    end = pos
                    while end + 1 in covered:
                        end += 1
                    spans.add((d, pos, end, end - pos + 1))
        return spans

    dup_starts: dict[int, set[int]] = defaultdict(set)
    rem_starts: dict[int, set[int]] = defaultdict(set)
    for gram, lst in occ.items():
        if len(lst) >= 2:
            canon = min(lst)
            for d, p in lst:
                dup_starts[d].add(p)
                if (d, p) != canon:
                    rem_starts[d].add(p)
    spans = cover(dup_starts)

    stats = {}
    per_doc: dict[int, list[tuple[int, int]]] = defaultdict(list)
    for d, s, e, ln in spans:
        per_doc[d].append((s, e))
    for d, tl in toks.items():
        sp = per_doc.get(d, [])
        dup_tokens = sum(e - s + 1 for s, e in sp)
        n = len(tl)
        stats[d] = (n, dup_tokens, len(sp), round(dup_tokens / n, 6) if n else 0.0)

    cleaned = {}
    rem_spans = cover(rem_starts)
    rem_per_doc: dict[int, set[int]] = defaultdict(set)
    for d, s, e, _ in rem_spans:
        rem_per_doc[d].update(range(s, e + 1))
    for d, tl in toks.items():
        kept = [t for i, t in enumerate(tl, start=1) if i not in rem_per_doc[d]]
        cleaned[d] = (" ".join(kept), len(tl) - len(kept))
    return spans, stats, cleaned


def _random_docs(seed: int, n_docs: int = 25) -> list[tuple[int, str]]:
    rng = random.Random(seed)
    out = []
    for d in range(n_docs):
        n = rng.randint(0, 30)
        out.append((d, " ".join(rng.choice(VOCAB) for _ in range(n))))
    return out


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_random_corpora_match_python_oracle(spark, seed):
    docs_py = _random_docs(seed)
    docs = spark.createDataFrame(docs_py, "doc_id long, text string")
    spans_o, stats_o, clean_o = _py_oracle(docs_py, L)

    spans_s = {(r.doc_id, r.span_start, r.span_end, r.span_len)
               for r in duplicate_spans(docs, min_len=L).collect()}
    assert spans_s == spans_o

    stats_s = {r.doc_id: (r.n_tokens, r.dup_tokens, r.n_spans, r.dup_ratio)
               for r in duplicate_span_stats(docs, min_len=L).collect()}
    assert stats_s == stats_o

    clean_s = {r.doc_id: (r.clean_text, r.n_removed)
               for r in remove_duplicate_text(docs, min_len=L).collect()}
    assert clean_s == clean_o

    # structural invariants
    by_doc: dict[int, list[tuple[int, int]]] = defaultdict(list)
    for d, s, e, ln in spans_s:
        assert ln == e - s + 1 >= L and s >= 1
        by_doc[d].append((s, e))
    for d, sp in by_doc.items():
        sp.sort()
        n_tokens = stats_s[d][0]
        assert all(e <= n_tokens for _, e in sp)
        # disjoint AND non-adjacent (adjacent coverage must have merged)
        assert all(b_s > a_e + 1 for (_, a_e), (b_s, _) in zip(sp, sp[1:]))
    for d, (n_tokens, dup_tokens, n_spans, _) in stats_s.items():
        kept = len([t for t in clean_s[d][0].split() if t])
        assert kept + clean_s[d][1] == n_tokens
        assert clean_s[d][1] <= dup_tokens


def test_removal_semantics_position_exact(spark):
    """The definitional guarantee, checked position-exactly: every token
    covered by a NON-canonical duplicated window is deleted, every other
    token survives in order — so the kept sequence is uniquely determined.
    Corollary checked too: a canonical occurrence whose positions are
    disjoint from all removal windows still carries its gram in the cleaned
    doc (the docstring's survival claim, with its overlap caveat applied)."""
    docs_py = _random_docs(9, n_docs=20)
    # two crafted docs whose shared passage sits amid unique tokens: its
    # canonical occurrence (doc 100) overlaps no other duplicate, so the
    # survival corollary below is guaranteed to be exercised at least once
    docs_py += [
        (100, "u1 u2 u3 alpha beta gamma delta eps u4 u5"),
        (101, "v1 v2 alpha beta gamma delta eps v3 v4"),
    ]
    docs = spark.createDataFrame(docs_py, "doc_id long, text string")
    toks = {d: _toks(t) for d, t in docs_py}

    occ: dict[str, list[tuple[int, int]]] = defaultdict(list)
    for d, tl in sorted(toks.items()):
        for p in range(1, len(tl) - L + 2):
            occ[" ".join(tl[p - 1 : p - 1 + L])].append((d, p))
    removed: dict[int, set[int]] = defaultdict(set)
    for lst in occ.values():
        if len(lst) >= 2:
            canon = min(lst)
            for d, p in lst:
                if (d, p) != canon:
                    removed[d].update(range(p, p + L))

    cleaned = {r.doc_id: (r.clean_text, r.n_removed)
               for r in remove_duplicate_text(docs, min_len=L).collect()}
    assert set(cleaned) == set(toks)
    for d, tl in toks.items():
        expect = [t for i, t in enumerate(tl, start=1) if i not in removed[d]]
        assert cleaned[d][0].split() == expect, f"doc {d}"
        assert cleaned[d][1] == len(removed[d])

    # canonical survival when (and only as far as) nothing overlaps it
    checked = 0
    for g, lst in occ.items():
        if len(lst) >= 2:
            d, p = min(lst)
            if not (set(range(p, p + L)) & removed[d]):
                grams_after = {
                    " ".join(w)
                    for w in zip(*(cleaned[d][0].split()[i:] for i in range(L)))
                }
                assert g in grams_after, f"uncovered canonical gram lost: {g!r}"
                checked += 1
    assert checked > 0  # the corpus must actually exercise the claim
