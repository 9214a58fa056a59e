"""Unit tests for dedup clustering (connected components → survivors) and
the training-prep operators (boilerplate spans, repetition stats,
stratified sampling, sequence packing) against hand-checkable python
oracles. Cross-engine value checks live in scripts/gate_check.py."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from igd_spark import (
    connected_components,
    dedup_clusters,
    fuzzy_dedup_docs,
    pack_sequences,
    remove_boilerplate,
    repetition_stats,
    sample_stratified,
    span_df,
)
from igd_spark.hashing import h60_py
from igd_spark.oracle import tokenize
from igd_spark.trainprep import sample_thresholds


def _cc_oracle(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Union-find min-label closure over the undirected edge list."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@pytest.mark.parametrize(
    "edges",
    [
        # two separate cliques + an isolated pair
        [(1, 2), (2, 3), (1, 3), (10, 11), (20, 21)],
        # a 6-node path: worst case for min-label propagation (diameter 5)
        [(5, 4), (4, 3), (3, 2), (2, 1), (1, 0)],
        # merge-late shape: two chains joined by one bridge edge
        [(0, 1), (2, 3), (4, 5), (1, 2), (3, 4), (100, 101)],
    ],
)
def test_connected_components_matches_union_find(spark, edges):
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {r["doc_id"]: r["component_id"] for r in connected_components(pairs).collect()}
    assert got == _cc_oracle(edges)


def test_connected_components_random_graphs(spark):
    # randomized structural check vs the union-find oracle: many small
    # graphs of varying shape (stars, chains, cliques, isolated pairs)
    import random

    rng = random.Random(1234)
    for trial in range(4):
        n = rng.randint(5, 40)
        edges = sorted(
            {
                tuple(sorted(rng.sample(range(n * 3), 2)))
                for _ in range(rng.randint(1, n))
            }
        )
        pairs = spark.createDataFrame(
            [(a, b) for a, b in edges], "doc_a long, doc_b long"
        )
        got = {r["doc_id"]: r["component_id"] for r in connected_components(pairs).collect()}
        assert got == _cc_oracle(edges), (trial, edges)


def test_connected_components_raises_when_unconverged(spark):
    """r4 (ADVICE): exhausting max_iter without the label-sum fixpoint must
    fail loudly — silently split components would mint multiple survivors
    per true cluster downstream."""
    import pytest

    edges = [(i + 1, i) for i in range(7)]  # 8-node path, diameter 7
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(pairs, max_iter=1)


def test_dedup_clusters_survivors(spark):
    docs = spark.createDataFrame([(i, f"d{i}") for i in range(8)], "doc_id long, text string")
    # {1,2,3} one cluster, {5,6} another; 0,4,7 singletons
    pairs = spark.createDataFrame([(1, 2), (2, 3), (5, 6)], "doc_a long, doc_b long")
    rows = {r["doc_id"]: r for r in dedup_clusters(docs, pairs).collect()}
    assert len(rows) == 8
    assert [rows[i]["component_id"] for i in range(8)] == [0, 1, 1, 1, 4, 5, 5, 7]
    assert [rows[i]["cluster_size"] for i in (1, 2, 3)] == [3, 3, 3]
    survivors = sorted(i for i, r in rows.items() if r["is_survivor"])
    assert survivors == [0, 1, 4, 5, 7]


def test_fuzzy_dedup_docs_minhash(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog again today ok"),
        (1, "the quick brown fox jumps over the lazy dog again today now"),  # near-dup of 0
        (2, "completely different content about spark and indexes here now today"),
        (3, "the quick brown fox jumps over the lazy dog again today ok"),   # exact dup of 0
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    kept = sorted(
        r["doc_id"]
        for r in fuzzy_dedup_docs(docs, method="minhash", threshold=0.5).collect()
    )
    assert 0 in kept and 2 in kept and 3 not in kept  # 0 survives its cluster
    assert kept == [0, 2] or kept == [0, 1, 2]  # 1 dedups iff LSH catches the near-dup


BPDOCS = [
    (0, "copyright header all rights reserved unique alpha content one two"),
    (1, "copyright header all rights reserved different beta content three four"),
    (2, "totally original text with no shared spans at all whatsoever"),
    (3, ""),
]


def test_remove_boilerplate_drops_shared_spans(spark):
    docs = spark.createDataFrame(BPDOCS, "doc_id long, text string")
    # span_tokens=5: docs 0 and 1 share the first 5-token span exactly
    got = {r["doc_id"]: r for r in remove_boilerplate(docs, span_tokens=5, min_df=2).collect()}
    assert got[0]["n_spans"] == 2 and got[0]["n_removed"] == 1
    assert got[0]["clean_text"] == "unique alpha content one two"
    assert got[1]["clean_text"] == "different beta content three four"
    assert got[2]["n_removed"] == 0 and got[2]["clean_text"] == " ".join(tokenize(BPDOCS[2][1]))
    assert got[3]["n_spans"] == 0 and got[3]["clean_text"] == ""
    sdf = {r["span"]: r["df"] for r in span_df(docs, span_tokens=5).collect()}
    assert sdf["copyright header all rights reserved"] == 2


def test_remove_boilerplate_fully_boilerplate_doc(spark):
    docs = spark.createDataFrame(
        [(0, "same five tokens here now"), (1, "same five tokens here now"), (2, "other stuff")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in remove_boilerplate(docs, span_tokens=5, min_df=2).collect()}
    assert got[0]["clean_text"] == "" and got[0]["n_removed"] == 1
    assert got[1]["clean_text"] == ""
    assert got[2]["clean_text"] == "other stuff"


def test_repetition_stats_hand_checked(spark):
    docs = spark.createDataFrame(
        [
            (0, "a a a a b"),          # top=4/5; bigrams: aa aa aa ab -> dup 2/4
            (1, "x y z"),              # no repetition
            (2, ""),                   # zero tokens
            (3, "w w w w w w"),        # all same: top=1.0; bigrams 5 all dup 4/5
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert got[0]["n_tokens"] == 5
    assert got[0]["top_token_frac"] == pytest.approx(0.8)
    assert got[0]["dup_bigram_frac"] == pytest.approx(0.5)
    assert got[1]["top_token_frac"] == pytest.approx(1 / 3, abs=1e-6)
    assert got[1]["dup_bigram_frac"] == 0.0
    assert got[2]["n_tokens"] == 0 and got[2]["top_token_frac"] == 0.0
    assert got[3]["top_token_frac"] == 1.0
    assert got[3]["dup_bigram_frac"] == pytest.approx(0.8)
    assert got[3]["dup_trigram_frac"] == pytest.approx(0.75)


def test_sample_stratified_deterministic_and_thresholded(spark):
    docs = spark.createDataFrame(
        [(i, "t", ["en", "fr", "zh"][i % 3]) for i in range(300)],
        "doc_id long, text string, lang string",
    )
    fr = {"en": 0.5, "fr": 0.1}
    got = sample_stratified(docs, fr, seed=7).collect()
    th = sample_thresholds(fr)
    for r in got:
        assert r["u60"] == h60_py(f"7:{r['doc_id']}")
        assert r["u60"] < th[r["stratum"]]
        assert r["stratum"] != "zh"  # absent stratum -> dropped
    # every qualifying doc is present (exact set, not approximate)
    expect = {
        i for i in range(300)
        if ["en", "fr", "zh"][i % 3] in th and h60_py(f"7:{i}") < th[["en", "fr", "zh"][i % 3]]
    }
    assert {r["doc_id"] for r in got} == expect
    # repeat run identical (no RNG)
    again = {r["doc_id"] for r in sample_stratified(docs, fr, seed=7).collect()}
    assert again == expect


def test_pack_sequences_sequential_fill(spark):
    docs = spark.createDataFrame(
        [(i, " ".join(["tok"] * (10 * (i + 1)))) for i in range(6)],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in pack_sequences(docs, budget_tokens=25, n_shards=1).collect()}
    # single shard, doc order 0..5, token counts 10,20,..,60; cum_before 0,10,30,60,100,150
    expect = {0: (0, 0), 1: (0, 10), 2: (1, 5), 3: (2, 10), 4: (4, 0), 5: (6, 0)}
    for d, (seq, off) in expect.items():
        assert (got[d]["seq_id"], got[d]["seq_offset"]) == (seq, off), d
    # sharded variant: per-shard packing is independent and deterministic
    sharded = pack_sequences(docs, budget_tokens=25, n_shards=4).collect()
    for r in sharded:
        assert r["shard"] == h60_py(str(r["doc_id"])) % 4


def test_connected_components_63bit_hash_ids(spark):
    """Regression: the convergence check sums labels — with the DEFAULT
    63-bit xxhash64 doc-id scheme a long sum overflows within a handful of
    nodes, and Spark 4's default ANSI mode turns that into a hard
    ArithmeticException. The sum must run in decimal."""
    big = (1 << 62)
    edges = [
        (big + 1, big + 2),
        (big + 2, big + 3),
        (big + 10, big + 11),
        (big + 20, big + 21),
        (big + 21, big + 22),
    ]
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {r["doc_id"]: r["component_id"] for r in connected_components(pairs).collect()}
    assert got == _cc_oracle(edges)


def test_cosine_neardup_auto_anchors_tiny_corpus(spark):
    """Regression: exact=False auto-anchor sizing on a corpus smaller than
    n_bands used to keep a non-divisible anchor count and crash the banded
    join's divisibility check; it must degrade gracefully (fewer/1-bit
    bands, or the exact path for 0-1 vectors) and still return the
    above-threshold pairs."""
    from igd_spark.similarity import cosine_neardup_pairs

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.01]), (3, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    rows = cosine_neardup_pairs(emb, threshold=0.95, exact=False).collect()
    assert {(r["vec_a"], r["vec_b"]) for r in rows} <= {(1, 2)}
    # the 1-vector corpus must not raise either
    one = spark.createDataFrame([(1, [1.0, 0.0])], "vec_id long, embedding array<double>")
    assert cosine_neardup_pairs(one, threshold=0.9, exact=False).count() == 0


def test_decontaminate_flag_and_drop(spark, tiny_docs):
    from igd_spark import decontaminate
    from igd_spark.corpus import assign_doc_ids
    from igd_spark.dedup import shingles

    import pyspark.sql.functions as F

    docs = assign_doc_ids(tiny_docs)
    bench = docs.filter(F.col("doc_id") % 11 == 0)
    n = 4
    flag = decontaminate(docs, bench, n=n, mode="flag").toPandas()
    # every doc is reported exactly once
    assert len(flag) == docs.count()
    assert flag["doc_id"].is_unique
    # python oracle: distinct doc shingles ∩ benchmark shingle set
    dsh = shingles(docs, n=n).toPandas()
    bset = set(shingles(bench, n=n).toPandas()["shingle"])
    exp = dsh[dsh["shingle"].isin(bset)].groupby("doc_id").size()
    got = flag.set_index("doc_id")["n_hits"]
    for d, cnt in exp.items():
        assert int(got[d]) == int(cnt)
    assert int(got.drop(exp.index).sum()) == 0
    assert (flag["contaminated"] == (flag["n_hits"] > 0)).all()
    # benchmark members contaminate themselves (they share all their shingles)
    bench_ids = set(bench.select("doc_id").toPandas()["doc_id"])
    flagged = set(flag[flag["contaminated"]]["doc_id"])
    with_shingles = set(dsh["doc_id"])
    assert (bench_ids & with_shingles) <= flagged
    # drop mode keeps exactly the clean docs, original columns intact
    clean = decontaminate(docs, bench, n=n, mode="drop")
    assert set(clean.columns) == set(docs.columns)
    assert set(clean.select("doc_id").toPandas()["doc_id"]) == set(
        flag[~flag["contaminated"]]["doc_id"]
    )


def test_decontaminate_mode_validation(spark, tiny_docs):
    from igd_spark import decontaminate

    import pytest as _pytest

    with _pytest.raises(ValueError):
        decontaminate(tiny_docs, tiny_docs, mode="purge")


def test_decontaminate_benchmark_without_doc_id(spark, tiny_docs):
    # review fix: the benchmark side needs only text, not the corpus id_col
    from igd_spark import decontaminate
    from igd_spark.corpus import assign_doc_ids

    import pyspark.sql.functions as F

    docs = assign_doc_ids(tiny_docs)
    bench_textonly = (
        docs.filter(F.col("doc_id") % 11 == 0).select(F.col("text").alias("content"))
    )
    out = decontaminate(docs, bench_textonly, n=4, bench_text_col="content").toPandas()
    # identical to passing the id-carrying benchmark
    ref = decontaminate(
        docs, docs.filter(F.col("doc_id") % 11 == 0), n=4
    ).toPandas()
    assert out.sort_values("doc_id").reset_index(drop=True).equals(
        ref.sort_values("doc_id").reset_index(drop=True)
    )


def test_redact_pii_patterns(spark):
    """Each PII class redacts to its tag; counts audit total matches;
    clean text redacts nothing; NULL text -> ''."""
    from igd_spark import redact_pii

    rows = [
        (0, "mail me at jo.doe+x@sub.example.org today"),
        (1, "ssn 123-45-6789 and phone 555-867-5309"),
        (2, "server at 192.168.001.250 port 80"),
        (3, "plain prose, nothing sensitive"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert out[0]["clean_text"] == "mail me at <EMAIL> today"
    assert out[0]["n_redacted"] == 1
    assert out[1]["clean_text"] == "ssn <SSN> and phone <PHONE>"
    assert out[1]["n_redacted"] == 2
    assert out[2]["clean_text"] == "server at <IP> port 80"
    assert out[2]["n_redacted"] == 1
    assert out[3]["clean_text"] == rows[3][1] and out[3]["n_redacted"] == 0
    assert out[4]["clean_text"] == "" and out[4]["n_redacted"] == 0


def test_chunk_documents_coverage_and_overlap(spark):
    """Chunks tile the token stream: concatenating each chunk's non-overlap
    prefix reconstructs the doc; overlap region of chunk i+1 equals the
    tail of chunk i; short and empty docs behave."""
    from igd_spark import chunk_documents

    rows = [
        (1, " ".join(f"w{i:02d}" for i in range(23))),  # 23 tokens
        (2, "a b c"),                                    # shorter than chunk
        (3, ""),                                         # empty -> no chunks
        (4, None),                                       # NULL -> no chunks
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_documents(d, chunk_tokens=10, overlap=3)
    got = {
        (r["doc_id"], r["chunk_id"]): (r["chunk_text"], r["n_tokens"])
        for r in out.collect()
    }
    # doc 1: step 7 -> chunks at 0,7,14 (1 + ceil(13/7) = 3)
    assert {k for k in got if k[0] == 1} == {(1, 0), (1, 1), (1, 2)}
    c0, c1, c2 = (got[(1, i)][0].split() for i in range(3))
    assert c0 == [f"w{i:02d}" for i in range(10)]
    assert c1[:3] == c0[-3:] and c2[:3] == c1[-3:]  # overlap contract
    assert c2 == [f"w{i:02d}" for i in range(14, 23)] and got[(1, 2)][1] == 9
    assert got[(2, 0)] == ("a b c", 3) and len([k for k in got if k[0] == 2]) == 1
    assert not [k for k in got if k[0] in (3, 4)]
    with pytest.raises(ValueError):
        chunk_documents(d, chunk_tokens=5, overlap=5)
    with pytest.raises(ValueError):
        chunk_documents(d, chunk_tokens=0)


def test_unigram_perplexity_bruteforce(spark, tiny_docs):
    import math
    from collections import Counter

    from igd_spark import unigram_perplexity
    from igd_spark.corpus import assign_doc_ids
    from igd_spark.tokenizer import postings

    docs = assign_doc_ids(tiny_docs)
    post = postings(docs).collect()
    cf = Counter()
    for r in post:
        cf[r["term"]] += r["tf"]
    total = sum(cf.values())
    by_doc: dict = {}
    for r in post:
        by_doc.setdefault(r["doc_id"], []).append((r["term"], r["tf"]))
    out = {r["doc_id"]: r for r in unigram_perplexity(docs).collect()}
    assert set(out) == set(by_doc)  # empty docs absent from both
    for d, toks in list(by_doc.items())[:50]:
        n = sum(tf for _, tf in toks)
        lp = sum(tf * math.log(cf[t] / total) for t, tf in toks)
        assert out[d]["n_tokens"] == n
        assert out[d]["ppl"] == pytest.approx(math.exp(-lp / n), rel=1e-9)


def test_unigram_perplexity_external_lm_smoothing(spark, tiny_docs):
    from igd_spark import unigram_perplexity
    from igd_spark.corpus import assign_doc_ids
    from pyspark.sql import functions as F

    # LM trained on half the corpus; the other half scored with Lidstone
    docs = assign_doc_ids(tiny_docs)
    half = docs.filter(F.col("doc_id") % 2 == 0)
    rest = docs.filter(F.col("doc_id") % 2 == 1)
    from igd_spark.tokenizer import postings

    lm = postings(half).groupBy("term").agg(F.sum("tf").alias("cf"))
    total = lm.agg(F.sum("cf")).collect()[0][0]
    out = unigram_perplexity(rest, lm=lm, total_tokens=int(total), alpha=1.0)
    rows = out.collect()
    assert rows and all(r["ppl"] > 0 for r in rows)
    with pytest.raises(ValueError):
        unigram_perplexity(rest, lm=lm)  # total_tokens required
    with pytest.raises(ValueError):
        unigram_perplexity(rest, alpha=-1.0)
