"""Randomized cross-check of phrase_suggest against a pure-Python oracle of
the documented semantics: Levenshtein<=d candidates (in-vocab token is its
own candidate), bigram-support re-rank with (sup desc, boost desc, df desc,
term asc) tie-break, winner-per-position, original order preserved. A small
near-collision vocabulary makes candidate sets and support ties dense."""

from __future__ import annotations

import random
import re
from collections import Counter, defaultdict

import pytest

from igd_spark import phrase_suggest, postings
from igd_spark.stats import term_stats

VOCAB = ["cat", "car", "cart", "bat", "bit", "bot", "dog", "dig", "dot",
         "ten", "tan", "tin"]
MAX_EDITS = 1


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _toks(text: str) -> list[str]:
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def _py_oracle(docs: list[tuple[int, str]], queries: list[tuple[int, str]]):
    doc_toks = {d: _toks(t) for d, t in docs}
    df = Counter()
    for tl in doc_toks.values():
        df.update(set(tl))
    c2: Counter = Counter()
    for tl in doc_toks.values():
        c2.update(zip(tl, tl[1:]))

    out = {}
    for qid, qtext in queries:
        tl = _toks(qtext)
        if not tl:
            continue
        picked, changed = [], 0
        for i, tok in enumerate(tl):
            lft = tl[i - 1] if i > 0 else None
            rgt = tl[i + 1] if i + 1 < len(tl) else None
            cands = []
            for term in df:
                d = _lev(term, tok)
                if d <= MAX_EDITS:
                    boost = max(0.0, 1.0 - d / min(len(term), len(tok)))
                    if boost > 0.0:
                        sup = c2.get((lft, term), 0) + c2.get((term, rgt), 0)
                        cands.append((-sup, -boost, -df[term], term))
            if cands:
                win = min(cands)[3]
            else:
                win = tok
            picked.append(win)
            changed += win != tok
        out[qid] = (" ".join(picked), changed)
    return out


def _mutate(rng: random.Random, w: str) -> str:
    i = rng.randrange(len(w))
    op = rng.choice(["sub", "del", "ins"])
    c = rng.choice("abcdefginot")
    if op == "sub":
        return w[:i] + c + w[i + 1:]
    if op == "del" and len(w) > 1:
        return w[:i] + w[i + 1:]
    return w[:i] + c + w[i:]


@pytest.mark.parametrize("seed", [11, 22, 33])
def test_random_corpora_match_python_oracle(spark, seed):
    rng = random.Random(seed)
    docs_py = [
        (d, " ".join(rng.choice(VOCAB) for _ in range(rng.randint(0, 15))))
        for d in range(30)
    ]
    queries_py = []
    for q in range(20):
        n = rng.randint(0, 4)
        toks = []
        for _ in range(n):
            w = rng.choice(VOCAB)
            if rng.random() < 0.5:
                w = _mutate(rng, w)
            toks.append(w)
        queries_py.append((q, " ".join(toks)))

    docs = spark.createDataFrame(docs_py, "doc_id long, text string")
    qs = spark.createDataFrame(queries_py, "query_id long, query_text string")
    ts = term_stats(postings(docs))

    got = {
        r.query_id: (r.suggestion, r.n_changed)
        for r in phrase_suggest(qs, docs, ts, max_edits=MAX_EDITS).collect()
    }
    want = _py_oracle(docs_py, queries_py)
    assert got == want
