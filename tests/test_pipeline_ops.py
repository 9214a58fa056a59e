"""Unit tests for the training-data pipeline operators (dedup, similarity,
textstats, multimodal) against small hand-checkable python oracles. The
cross-engine value checks live in scripts/gate_check.py (DuckDB); these
verify the semantics directly."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from igd_spark import (
    cosine_neardup_pairs,
    cosine_topk,
    exact_dedup,
    fingerprint,
    lang_id,
    minhash_signatures,
    ngram_jaccard_pairs,
    shingles,
    simhash,
    simhash_dedup_pairs,
    text_stats,
)
from igd_spark.hashing import h60_py, h60_seeded_py
from igd_spark.oracle import tokenize


@pytest.fixture(scope="module")
def small_docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog again today"),
        (1, "the quick brown fox jumps over the lazy dog again tomorrow"),
        (2, "completely different content about spark and indexes here now"),
        (3, "the quick brown fox jumps over the lazy dog again today"),  # dup of 0
        (4, ""),
        (5, "tiny"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_exact_dedup_groups(spark, small_docs):
    got = {r["doc_id"]: (r["canonical_id"], r["group_size"], r["is_canonical"])
           for r in exact_dedup(small_docs).collect()}
    assert got[0] == (0, 2, True)
    assert got[3] == (0, 2, False)
    assert got[1][1] == 1 and got[1][2]
    assert got[4][1] == 1  # empty doc is its own group


def test_shingles_and_jaccard(spark, small_docs):
    sh = shingles(small_docs, n=5)
    got0 = {r["shingle"] for r in sh.filter("doc_id = 0").collect()}
    toks = tokenize("the quick brown fox jumps over the lazy dog again today")
    want0 = {" ".join(toks[i : i + 5]) for i in range(len(toks) - 4)}
    assert got0 == want0
    # docs 0/3 identical → jaccard 1.0; 0/1 differ in last token
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"]
             for r in ngram_jaccard_pairs(small_docs, threshold=0.1).collect()}
    assert pairs[(0, 3)] == 1.0
    inter = len(want0 & {" ".join(tokenize(
        "the quick brown fox jumps over the lazy dog again tomorrow")[i:i+5])
        for i in range(7)})
    assert abs(pairs[(0, 1)] - inter / (7 + 7 - inter)) < 1e-6
    # doc 5 ("tiny") has <5 tokens → no shingles, never a candidate
    assert not any(5 in p for p in pairs)


def test_minhash_identical_docs_agree_everywhere(spark, small_docs):
    sigs = minhash_signatures(small_docs, n_hashes=8)
    bydoc: dict = {}
    for r in sigs.collect():
        bydoc.setdefault(r["doc_id"], {})[r["seed"]] = r["mh"]
    assert bydoc[0] == bydoc[3]
    # python mirror of one slot
    sh0 = {" ".join(tokenize("the quick brown fox jumps over the lazy dog again today")[i:i+5]) for i in range(7)}
    assert bydoc[0][3] == min(h60_seeded_py(3, s) for s in sh0)


def test_simhash_python_mirror(spark, small_docs):
    got = {r["doc_id"]: r["simhash"] for r in simhash(small_docs).collect()}

    def py_simhash(text, bits=32):
        from collections import Counter

        tf = Counter(tokenize(text))
        out = 0
        for j in range(bits):
            s = sum(c * (2 * ((h60_py(t) >> j) & 1) - 1) for t, c in tf.items())
            if s >= 0:
                out |= 1 << j
        return out

    for did, text in [(0, "the quick brown fox jumps over the lazy dog again today"),
                      (2, "completely different content about spark and indexes here now")]:
        assert got[did] == py_simhash(text)
    # identical docs → identical sketch; near-dup pair check
    assert got[0] == got[3]
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"]
             for r in simhash_dedup_pairs(small_docs, max_hamming=3).collect()}
    assert pairs[(0, 3)] == 0


def test_keywords_topk_tfidf(spark, small_docs):
    """Per-doc tf-idf keywords vs a direct python computation: same scores,
    same (tfidf desc, term asc) ranking, k rows max per doc."""
    from collections import Counter

    from igd_spark import keywords_topk

    rows = {r["doc_id"]: r["text"] for r in small_docs.collect()}
    tfs = {d: Counter(tokenize(t)) for d, t in rows.items()}
    df = Counter(term for c in tfs.values() for term in c)
    n = len(rows)
    want = {}
    for d, c in tfs.items():
        scored = sorted(
            ((round(tf * math.log(n / df[t]), 6), t) for t, tf in c.items()),
            key=lambda x: (-x[0], x[1]),
        )[:3]
        for rank, (s, t) in enumerate(scored, 1):
            want[(d, rank)] = (t, s)
    got = {
        (r["doc_id"], r["rank"]): (r["term"], round(r["tfidf"], 6))
        for r in keywords_topk(small_docs, k=3, round_dp=6).collect()
    }
    assert got == want


def test_fingerprint_order_sensitive(spark):
    docs = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "gamma beta alpha"), (2, "alpha beta gamma")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["fp"] for r in fingerprint(docs).collect()}
    assert got[0] == got[2] != got[1]
    want = sum((h60_py(t) % (1 << 20)) * (i + 1)
               for i, t in enumerate(["alpha", "beta", "gamma"]))
    assert got[0] == want


def test_text_stats_values(spark):
    docs = spark.createDataFrame([(0, "The cat, and a DOG!")], "doc_id long, text string")
    r = text_stats(docs).collect()[0]
    # tokens: the, cat, and, a, dog → 5; stopwords: the, and, a → 3
    assert r["n_tokens"] == 5
    assert r["n_chars"] == 19
    assert abs(r["stopword_ratio"] - 3 / 5) < 1e-6
    assert abs(r["avg_token_len"] - (3 + 3 + 3 + 1 + 3) / 5) < 1e-6


def test_lang_id_votes(spark):
    docs = spark.createDataFrame(
        [
            (0, "der hund und die katze ist hier"),
            (1, "the cat and the dog is here"),
            (2, "xyzzy plugh nothing matches"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["lang_pred"] for r in lang_id(docs).collect()}
    assert got[0] == "de" and got[1] == "en" and got[2] == "und"


def test_cosine_topk_self_first(spark):
    vecs = [(i, [float((i * 7 + j * 3) % 11 - 5) for j in range(8)]) for i in range(20)]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    qs = emb.filter("vec_id < 3").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    top = cosine_topk(emb, qs, k=3).collect()
    for r in top:
        if r["rank"] == 1:
            # self-similarity is 1.0 → self (or an identical vector with a
            # smaller id) ranks first
            assert r["cos"] == 1.0


def test_media_plumbing(spark, small_docs):
    from igd_spark.multimodal import (
        FEATURE_DIM,
        extract_features,
        frame_sample,
        media_stats,
        synth_media,
    )

    m = synth_media(small_docs).cache()
    stats = {r["media_id"]: r for r in media_stats(m).collect()}
    payload = b"the quick brown fox jumps over the lazy dog again today"
    assert stats[0]["n_bytes"] == len(payload)
    # cross-engine spec: md5 of the UPPERCASE hex of the payload bytes
    want_md5 = hashlib.md5(payload.hex().upper().encode()).hexdigest()[:8]
    assert stats[0]["md5_8"] == want_md5
    assert stats[4]["n_bytes"] == 0 and stats[4]["entropy_q"] == 0
    feats = {r["media_id"]: r["feature"] for r in extract_features(m).collect()}
    assert len(feats[0]) == FEATURE_DIM
    assert abs(float(np.linalg.norm(feats[0])) - 1.0) < 1e-9
    # long format: FEATURE_DIM rows per media, values match the array path
    from igd_spark.multimodal import extract_features_long

    long_rows = extract_features_long(m).collect()
    assert len(long_rows) == FEATURE_DIM * m.count()
    for r in long_rows:
        if r["media_id"] == 0:
            assert abs(r["value"] - round(float(feats[0][r["dim"]]), 6)) <= 1e-6
    frames = frame_sample(m, n_frames=4).collect()
    vids = {r["media_id"] for r in frames}
    assert vids == {2, 5}  # doc_id % 3 == 2 → video
    for r in frames:
        assert 0 <= r["frame_offset"] <= stats[r["media_id"]]["n_bytes"]
    # real-codec path is stubbed in this container
    from igd_spark.multimodal import _try_real_decode

    with pytest.raises(NotImplementedError):
        _try_real_decode(b"xx", "audio")


def test_sessionize_gap_semantics(spark):
    """Hand-checkable fixture: gaps > 30min cut sessions; ties deterministic."""
    import pandas as pd

    from igd_spark.events import sessionize

    base = pd.Timestamp("2024-01-01T00:00:00")
    rows = [
        # user 1: 3 events in one session, then a 31-min gap -> new session
        (0, base, 1, "a", 1.5),
        (1, base + pd.Timedelta(minutes=10), 1, "b", 2.25),
        (2, base + pd.Timedelta(minutes=20), 1, "c", 3.0),
        (3, base + pd.Timedelta(minutes=51), 1, "d", 4.0),
        # user 2: single event
        (4, base, 2, "a", 7.0),
    ]
    ev = spark.createDataFrame(
        pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value"])
    )
    out = {(r["user_id"], r["session_id"]): r for r in sessionize(ev, 30).collect()}
    assert len(out) == 3
    assert out[(1, 1)]["n_events"] == 3 and abs(out[(1, 1)]["sum_value"] - 6.75) < 1e-9
    assert out[(1, 2)]["n_events"] == 1 and out[(1, 2)]["sum_value"] == 4.0
    assert out[(2, 1)]["n_events"] == 1
    span_us = out[(1, 1)]["end_us"] - out[(1, 1)]["start_us"]
    assert span_us == 20 * 60 * 1_000_000


def test_ivf_nprobe_superset_and_recall(spark):
    """nprobe=|cells| must equal brute force (full recall); nprobe=1 must
    return a valid ranked subset."""
    from igd_spark import cosine_topk, pick_anchors
    from igd_spark.similarity import ivf_ann_topk

    vecs = [(i, [float((i * 7 + j * 3) % 11 - 5) for j in range(8)]) for i in range(30)]
    emb_df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    anchors = pick_anchors(emb_df, 4)
    q = emb_df.limit(2).selectExpr("vec_id as query_id", "embedding as query_vec")

    def key(df):
        return sorted((r["query_id"], r["rank"], r["vec_id"]) for r in df.collect())

    one = key(ivf_ann_topk(emb_df, q, anchors, k=5, nprobe=1))
    assert len(one) > 0
    full = key(ivf_ann_topk(emb_df, q, anchors, k=5, nprobe=len(anchors)))
    brute = key(cosine_topk(emb_df, q, k=5))
    assert full == brute


def test_curate_reasons_and_precedence(spark):
    from igd_spark import curate, curated_docs

    rows = [
        (0, "the quick brown fox jumps over the lazy dog and it is in the yard " * 3),
        (1, "the quick brown fox jumps over the lazy dog and it is in the yard " * 3),  # dup of 0
        (2, "der hund und die katze ist hier im haus und der garten ist auch hier " * 3),  # German
        (3, "@@@@ !!!! #### $$$$"),  # junk: low quality, und lang -> lang first
        (4, "x"),  # short: lang 'und' wins before quality
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["keep"], r["reason"]) for r in curate(docs).collect()}
    assert got[0] == (True, None)
    assert got[1] == (False, "duplicate")  # dup precedes lang/quality
    assert got[2] == (False, "lang")
    assert got[3] == (False, "lang")  # no markers -> 'und' -> lang precedes quality
    kept = {r["doc_id"] for r in curated_docs(docs).collect()}
    assert kept == {0}
    # quality reason reachable: force lang pass with low quality via langs=("und",)
    got2 = {r["doc_id"]: r["reason"] for r in curate(docs, langs=("en", "und")).collect()}
    assert got2[3] == "quality"


def test_ngram_jaccard_shingle_cap(spark):
    """Hot shingles above max_shingle_df leave the similarity space in BOTH
    the candidate join and the set sizes (capped-space Jaccard)."""
    boiler = "alpha beta gamma delta epsilon"  # df=3 shingle once repeated
    rows = [
        (0, boiler + " zeta eta theta iota kappa"),
        (1, boiler + " zeta eta theta iota lambda"),
        (2, boiler + " mu nu xi omicron pi"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = {(r["doc_a"], r["doc_b"]): r["jaccard"]
                for r in ngram_jaccard_pairs(docs, threshold=0.01).collect()}
    capped = {(r["doc_a"], r["doc_b"]): r["jaccard"]
              for r in ngram_jaccard_pairs(docs, threshold=0.01, max_shingle_df=2).collect()}
    # the boilerplate 5-gram has df=3 > 2: with the cap, docs 0/2 and 1/2
    # share nothing anymore; 0/1 still share their "boiler zeta eta..." tail
    assert (0, 2) in uncapped and (0, 2) not in capped
    # docs 0/1 (10 tokens, 6 shingles each): share 5 shingles; the capped
    # space drops the df=3 boilerplate shingle from BOTH numerator and sizes
    assert abs(uncapped[(0, 1)] - 5 / (6 + 6 - 5)) < 1e-6
    assert abs(capped[(0, 1)] - 4 / (5 + 5 - 4)) < 1e-6


def test_source_overlap_exact_normalizes_pair_orientation(spark):
    """Exact mode: a source pair's count must land in ONE (src_a < src_b)
    row even when doc-id order disagrees with source order, and the
    diagonal counts within-source duplicate pairs."""
    from igd_spark import source_overlap_matrix

    rows = [
        # same text across sources, doc ids ordered AGAINST source names:
        # (zeta, doc 0) vs (alpha, doc 1) and (alpha, doc 2) vs (zeta, doc 3)
        (0, "zeta", "shared text one"),
        (1, "alpha", "shared text one"),
        (2, "alpha", "shared text two"),
        (3, "zeta", "shared text two"),
        # within-source duplicate → diagonal row
        (4, "alpha", "inner dup"),
        (5, "alpha", "inner dup"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {(r["src_a"], r["src_b"]): r["n_shared"]
           for r in source_overlap_matrix(docs, granularity="exact").collect()}
    assert got == {("alpha", "zeta"): 2, ("alpha", "alpha"): 1}


def test_cosine_topk_min_sim_cutoff(spark):
    import numpy as np

    from igd_spark import cosine_topk

    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(40, 8)).astype(float)
    emb = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    q = spark.createDataFrame(
        [(0, vecs[0].tolist())], "query_id long, query_vec array<double>"
    )
    base = cosine_topk(emb, q, k=40).collect()
    th = sorted((r["cos"] for r in base), reverse=True)[9]  # keep exactly 10
    cut = cosine_topk(emb, q, k=40, min_sim=th).collect()
    assert len(cut) == 10
    assert all(r["cos"] >= th for r in cut)
    # ranks are recomputed over survivors: contiguous from 1
    assert sorted(r["rank"] for r in cut) == list(range(1, 11))
