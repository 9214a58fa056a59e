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
