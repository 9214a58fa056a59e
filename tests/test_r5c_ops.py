"""Round-5 final tranche: DSIR importance resampling, frequent_item_sets,
variable_width_histogram — brute-force / hand-computed semantics checks."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from igd_spark import (
    dsir_select,
    dsir_weights,
    frequent_item_sets_agg,
    variable_width_histogram_agg,
)
from igd_spark.hashing import h60_py


def _docs_df(spark, rows):
    # rows: (doc_id, text, source)
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    ).withColumn("n_chars", F.length("text").cast("long"))


def _queries(spark, rows):
    return spark.createDataFrame(rows, "query_id long, query_text string")


# ---------------------------------------------------------------------------
# DSIR


def _py_dsir(rows, target, n_buckets, alpha):
    """Pure-python oracle: tokenize, unigram+bigram grams, h60 buckets,
    Laplace multinomials, per-doc log-likelihood-ratio sum."""
    import re

    def toks(t):
        return [x for x in re.split(r"[^a-z0-9]+", t.lower()) if x]

    doc_buckets, c_r, c_t = {}, Counter(), Counter()
    for doc_id, text, source in rows:
        tl = toks(text)
        grams = tl + [f"{a} {b}" for a, b in zip(tl, tl[1:])]
        bs = [h60_py(g) % n_buckets for g in grams]
        doc_buckets[doc_id] = bs
        for b in bs:
            c_r[b] += 1
            if source == target:
                c_t[b] += 1
    t_r, t_t = sum(c_r.values()), sum(c_t.values())
    out = {}
    for doc_id, bs in doc_buckets.items():
        if not bs:
            continue
        lw = sum(
            math.log((c_t[b] + alpha) / (t_t + alpha * n_buckets))
            - math.log((c_r[b] + alpha) / (t_r + alpha * n_buckets))
            for b in bs
        )
        out[doc_id] = (len(bs), round(lw, 6))
    return out


DSIR_ROWS = [
    (1, "quantum physics lecture notes on entanglement", "quality"),
    (2, "quantum entanglement and bell inequalities explained", "quality"),
    (3, "buy cheap pills online discount pharmacy deals", "web"),
    (4, "discount deals buy now cheap online offers", "web"),
    (5, "notes on quantum physics and bell tests", "web"),
    (6, "", "web"),
]


def test_dsir_weights_matches_python_oracle(spark):
    docs = _docs_df(spark, DSIR_ROWS)
    got = {
        r["doc_id"]: (r["n_feats"], r["logw"])
        for r in dsir_weights(docs, "quality", n_buckets=64, alpha=1.0).collect()
    }
    want = _py_dsir(DSIR_ROWS, "quality", 64, 1.0)
    assert got == want


def test_dsir_targetlike_docs_outweigh_spam(spark):
    docs = _docs_df(spark, DSIR_ROWS)
    w = {
        r["doc_id"]: r["logw"]
        for r in dsir_weights(docs, "quality", n_buckets=64, alpha=1.0).collect()
    }
    # doc 5 shares the target's vocabulary; docs 3/4 share none of it
    assert w[5] > w[3] and w[5] > w[4]
    # empty doc emits no row
    assert 6 not in w


def test_dsir_select_is_top_n_of_weights(spark):
    docs = _docs_df(spark, DSIR_ROWS)
    w = dsir_weights(docs, "quality", n_buckets=64, alpha=1.0).collect()
    order = sorted(w, key=lambda r: (-r["logw"], r["doc_id"]))
    sel = dsir_select(docs, "quality", 3, n_buckets=64, alpha=1.0).collect()
    assert [r["doc_id"] for r in sorted(sel, key=lambda r: r["rank"])] == [
        r["doc_id"] for r in order[:3]
    ]


def test_dsir_validates_params(spark):
    docs = _docs_df(spark, DSIR_ROWS)
    with pytest.raises(ValueError):
        dsir_weights(docs, "quality", n_buckets=0)
    with pytest.raises(ValueError):
        dsir_weights(docs, "quality", alpha=0.0)
    with pytest.raises(ValueError):
        dsir_select(docs, "quality", 0)


# ---------------------------------------------------------------------------
# frequent_item_sets


FIS_ROWS = [
    # "alpha beta" co-occur in 3 docs; "alpha beta gamma" in 2
    (1, "alpha beta gamma", "s"),
    (2, "alpha beta gamma delta", "s"),
    (3, "alpha beta epsilon", "s"),
    (4, "alpha zeta", "s"),
    (5, "beta eta", "s"),
    (6, "unrelated words here", "s"),
]


def test_frequent_item_sets_hand_computed(spark):
    docs = _docs_df(spark, FIS_ROWS)
    qs = _queries(spark, [(0, "alpha beta")])  # matches docs 1-5
    out = frequent_item_sets_agg(
        docs, qs, min_support=2, max_size=3, min_set_size=2, k=10
    ).collect()
    sets = {(tuple(r["items"]), r["support"]) for r in out}
    assert (("alpha", "beta"), 3) in sets
    assert (("alpha", "gamma"), 2) in sets
    assert (("beta", "gamma"), 2) in sets
    assert (("alpha", "beta", "gamma"), 2) in sets
    # delta/epsilon/zeta/eta all have support 1 -> pruned at level 1
    assert all("delta" not in s[0] for s in sets)
    # ranking: support desc, size asc, lexicographic
    ranked = sorted(out, key=lambda r: r["rank"])
    assert tuple(ranked[0]["items"]) == ("alpha", "beta")
    assert ranked[0]["support"] == 3


def test_frequent_item_sets_min_support_binds(spark):
    docs = _docs_df(spark, FIS_ROWS)
    qs = _queries(spark, [(0, "alpha beta")])
    out = frequent_item_sets_agg(
        docs, qs, min_support=3, max_size=3, min_set_size=2, k=10
    ).collect()
    assert {tuple(r["items"]) for r in out} == {("alpha", "beta")}


def test_frequent_item_sets_validates_params(spark):
    docs = _docs_df(spark, FIS_ROWS)
    qs = _queries(spark, [(0, "alpha")])
    with pytest.raises(ValueError):
        frequent_item_sets_agg(docs, qs, min_support=0)
    with pytest.raises(ValueError):
        frequent_item_sets_agg(docs, qs, min_set_size=3, max_size=2)


# ---------------------------------------------------------------------------
# variable_width_histogram


def test_variable_width_histogram_hand_computed(spark):
    # values 10,11,12 | 50,51 | 100 -> the two largest gaps (50-12=38,
    # 100-51=49) are the cuts at buckets=3
    rows = [
        (1, "common term", "s"),
        (2, "common term", "s"),
        (3, "common term", "s"),
        (4, "common term", "s"),
        (5, "common term", "s"),
        (6, "common term", "s"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    ).withColumn(
        "val",
        F.element_at(
            F.array(*[F.lit(float(x)) for x in (10, 11, 12, 50, 51, 100)]),
            F.col("doc_id").cast("int"),
        ),
    )
    qs = _queries(spark, [(0, "common")])
    out = variable_width_histogram_agg(docs, qs, "val", buckets=3).collect()
    got = sorted((r["b_min"], r["b_max"], r["n_docs"], r["centroid"]) for r in out)
    assert got == [
        (10.0, 12.0, 3, 11.0),
        (50.0, 51.0, 2, 50.5),
        (100.0, 100.0, 1, 100.0),
    ]


def test_variable_width_histogram_fewer_values_than_buckets(spark):
    rows = [(1, "x y", "s"), (2, "x y", "s")]
    docs = _docs_df(spark, rows)  # n_chars identical for both docs
    qs = _queries(spark, [(0, "x")])
    out = variable_width_histogram_agg(docs, qs, "n_chars", buckets=5).collect()
    assert len(out) == 1 and out[0]["n_docs"] == 2

    with pytest.raises(ValueError):
        variable_width_histogram_agg(docs, qs, "n_chars", buckets=0)


# ---------------------------------------------------------------------------
# children_agg / random_sampler_agg


def test_children_agg_hand_computed(spark):
    from igd_spark import children_agg

    # conv 0 = docs 1,2 (one hit), conv 1 = docs 3,4 (no hits)
    rows = [
        (1, "alpha term", "s"),
        (2, "beta filler", "s"),
        (3, "gamma other", "s"),
        (4, "delta other", "s"),
    ]
    docs = _docs_df(spark, rows).withColumn(
        "conv_id", (F.col("doc_id") - 1) / F.lit(2)
    ).withColumn("conv_id", F.floor("conv_id"))
    docs = docs.withColumn("val", F.col("doc_id").cast("double"))
    qs = _queries(spark, [(0, "alpha")])
    out = children_agg(docs, qs, "val", parent_col="conv_id").collect()
    # the one matched doc (1) pulls in its whole conversation (docs 1+2)
    assert len(out) == 1
    r = out[0]
    assert r["n_children"] == 2 and r["sum_v"] == 3.0 and r["avg_v"] == 1.5


def test_random_sampler_agg_deterministic_and_scaled(spark):
    from igd_spark import random_sampler_agg
    from igd_spark.hashing import h60_py

    rows = [(i, "common token text", "s") for i in range(1, 41)]
    docs = _docs_df(spark, rows).withColumn("val", F.lit(1.0))
    qs = _queries(spark, [(0, "common")])
    p, seed = 0.5, 11
    out = random_sampler_agg(docs, qs, "val", probability=p, seed=seed).collect()
    expected = [i for i in range(1, 41) if h60_py(f"{seed}:{i}") < p * (1 << 60)]
    assert len(out) == 1
    r = out[0]
    assert r["n_sampled"] == len(expected)
    assert r["n_docs_est"] == round(len(expected) / p)
    assert r["sum_v_est"] == round(len(expected) / p, 6)
    # identical on a second run (deterministic hash, no RNG state)
    out2 = random_sampler_agg(docs, qs, "val", probability=p, seed=seed).collect()
    assert out2[0]["n_sampled"] == r["n_sampled"]

    with pytest.raises(ValueError):
        random_sampler_agg(docs, qs, "val", probability=0.0)
    with pytest.raises(ValueError):
        random_sampler_agg(docs, qs, "val", probability=1.5)


def test_frequent_item_sets_ubiquity_cap_binds(spark):
    # "alpha" is in every matched doc; with a 0.8 ceiling it is excluded
    # from itemsets even though it is maximally frequent
    docs = _docs_df(spark, FIS_ROWS)
    qs = _queries(spark, [(0, "alpha beta")])  # match set = docs 1-5
    capped = frequent_item_sets_agg(
        docs, qs, min_support=2, max_size=3, min_set_size=2, k=10,
        max_support_frac=0.8,
    ).collect()
    # alpha appears in 4/5 matched docs (0.8 exactly -> kept); beta in 4/5
    # too; gamma 2/5. Lower the ceiling below 0.8 and alpha/beta vanish.
    tight = frequent_item_sets_agg(
        docs, qs, min_support=2, max_size=3, min_set_size=2, k=10,
        max_support_frac=0.5,
    ).collect()
    assert any("alpha" in r["items"] for r in capped)
    assert not any("alpha" in r["items"] or "beta" in r["items"] for r in tight)

    with pytest.raises(ValueError):
        frequent_item_sets_agg(docs, qs, max_support_frac=0.0)


def test_parent_agg_hand_computed(spark):
    from igd_spark import parent_agg

    # conv 0 = docs 1,2 (two hits -> parent counted ONCE), conv 1 = docs
    # 3,4 (one hit); parent frame = first turn of each conv
    rows = [
        (1, "alpha one", "s"),
        (2, "alpha two", "s"),
        (3, "alpha three", "s"),
        (4, "other text", "s"),
    ]
    docs = _docs_df(spark, rows).withColumn(
        "conv_id", F.floor((F.col("doc_id") - 1) / F.lit(2))
    )
    parent_docs = docs.filter(F.col("doc_id") % 2 == 1).withColumn(
        "pval", F.col("doc_id").cast("double") * 10
    )
    qs = _queries(spark, [(0, "alpha")])
    out = parent_agg(docs, qs, parent_docs, "pval", parent_col="conv_id").collect()
    assert len(out) == 1
    r = out[0]
    # parents 0 and 1, values 10 and 30
    assert r["n_parents"] == 2 and r["sum_v"] == 40.0 and r["avg_v"] == 20.0


# ---------------------------------------------------------------------------
# randomized brute-force cross-checks (the guard for the in-row enumeration)


def _py_fis(doc_terms, match_docs, min_support, max_support_frac,
            min_support_frac, k):
    """Pure-python frequent-item-sets oracle: brute-force combinations."""
    from itertools import combinations

    msize = len(match_docs)
    floor = max(min_support, math.ceil(min_support_frac * msize))
    ceil_s = max_support_frac * msize
    sets = [sorted(doc_terms[d]) for d in match_docs]
    item_support = Counter(t for s in sets for t in set(s))
    freq = {t for t, c in item_support.items() if floor <= c <= ceil_s}
    out = []
    for size in (2, 3):
        cnt = Counter()
        for s in sets:
            fs = sorted(set(s) & freq)
            for combo in combinations(fs, size):
                cnt[combo] += 1
        for combo, c in cnt.items():
            if c >= floor:
                out.append((size, list(combo), c))
    out.sort(key=lambda r: (-r[2], r[0], " ".join(r[1])))
    return [(i + 1, sz, items, sup) for i, (sz, items, sup) in enumerate(out[:k])]


def test_frequent_item_sets_random_vs_bruteforce(spark):
    import random

    for seed in (3, 17, 99):
        rng = random.Random(seed)
        vocab = [f"w{i}" for i in range(12)]
        rows = []
        for d in range(1, 41):
            n = rng.randint(0, 8)
            terms = rng.sample(vocab, n) if n else []
            # repeated tokens exercise the DISTINCT-items contract
            text = " ".join(terms + terms[:2])
            rows.append((d, text if text else "zzfiller", "s"))
        docs = _docs_df(spark, rows)
        # query on the hottest word so the match set is non-trivial
        qterm = max(
            Counter(t for _, tx, _ in rows for t in set(tx.split())).items(),
            key=lambda kv: kv[1],
        )[0]
        qs = _queries(spark, [(0, qterm)])
        got = sorted(
            (r["rank"], r["size"], list(r["items"]), r["support"])
            for r in frequent_item_sets_agg(
                docs, qs, min_support=2, k=15,
                max_support_frac=0.9, min_support_frac=0.1,
            ).collect()
        )
        doc_terms = {d: set(tx.split()) for d, tx, _ in rows}
        match = [d for d, tx, _ in rows if qterm in doc_terms[d]]
        want = sorted(_py_fis(doc_terms, match, 2, 0.9, 0.1, 15))
        assert got == want, f"seed={seed}: {got} != {want}"


def test_dsir_random_vs_python_oracle(spark):
    import random

    for seed in (5, 23):
        rng = random.Random(seed)
        vocab = [f"t{i}" for i in range(30)]
        rows = []
        for d in range(1, 31):
            n = rng.randint(0, 12)
            text = " ".join(rng.choice(vocab) for _ in range(n))
            rows.append((d, text, rng.choice(["tgt", "raw", "raw"])))
        docs = _docs_df(spark, rows)
        got = {
            r["doc_id"]: (r["n_feats"], r["logw"])
            for r in dsir_weights(docs, "tgt", n_buckets=32, alpha=0.5).collect()
        }
        want = _py_dsir(rows, "tgt", 32, 0.5)
        assert got == want, f"seed={seed}"


# ---------------------------------------------------------------------------
# S-stemmer / stemmed BM25 / pseudo-relevance feedback


def _py_sstem(t):
    if len(t) < 4:
        return t
    if t.endswith("ies") and not t.endswith(("eies", "aies")):
        return t[:-3] + "y"
    if t.endswith("es") and not t.endswith(("aes", "ees", "oes")):
        return t[:-1]
    if t.endswith("s") and not (t.endswith("us") or t.endswith("ss")):
        return t[:-1]
    return t


def test_sstem_token_matches_python(spark):
    from igd_spark.tokenizer import sstem_token

    words = [
        "tables", "queries", "bodies", "indexes", "trees", "toes",
        "agrees", "pass", "gas", "us", "its", "is", "series", "bus",
        "classes", "buses", "flies", "goes", "shoes", "aliases", "table",
    ]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    got = {
        r["w"]: r["s"]
        for r in df.select("w", sstem_token(F.col("w")).alias("s")).collect()
    }
    assert got == {w: _py_sstem(w) for w in words}


def test_stemmed_bm25_conflates_plurals(spark):
    from igd_spark import stemmed_bm25_topk
    from igd_spark.search import exact_bm25_topk

    rows = [
        (1, "the table holds rows", "s"),
        (2, "many tables hold many rows", "s"),
        (3, "unrelated content here", "s"),
    ]
    docs = _docs_df(spark, rows)
    qs = _queries(spark, [(0, "tables")])
    plain = {r["doc_id"] for r in exact_bm25_topk(docs, qs, k=10).collect()}
    stemmed = {r["doc_id"] for r in stemmed_bm25_topk(docs, qs, k=10).collect()}
    assert plain == {2}            # literal match only
    assert stemmed == {1, 2}       # 'tables' ~ 'table' after stemming


def test_prf_expands_to_cooccurring_terms(spark):
    from igd_spark import prf_bm25_topk
    from igd_spark.search import exact_bm25_topk

    # 'alpha' docs also contain 'omega'; doc 4 has ONLY 'omega' — plain
    # BM25 can never return it for query 'alpha', PRF can
    rows = [
        (1, "alpha omega one", "s"),
        (2, "alpha omega two", "s"),
        (3, "alpha omega three", "s"),
        (4, "omega four entirely", "s"),
        (5, "unrelated filler text", "s"),
    ]
    docs = _docs_df(spark, rows)
    qs = _queries(spark, [(0, "alpha")])
    plain = {r["doc_id"] for r in exact_bm25_topk(docs, qs, k=10).collect()}
    assert 4 not in plain
    prf = {
        r["doc_id"]
        for r in prf_bm25_topk(
            docs, qs, k=10, fb_docs=3, fb_terms=3, orig_weight=0.6
        ).collect()
    }
    assert 4 in prf
    # zero-hit query -> no feedback evidence -> no rows
    qz = _queries(spark, [(1, "zzznotaword")])
    assert prf_bm25_topk(docs, qz, k=10, fb_docs=3, fb_terms=3).count() == 0

    with pytest.raises(ValueError):
        prf_bm25_topk(docs, qs, fb_docs=0)
    with pytest.raises(ValueError):
        prf_bm25_topk(docs, qs, orig_weight=0.0)


def test_proximity_boost_reorders_bag_of_words_ties(spark):
    from igd_spark import proximity_bm25_topk
    from igd_spark.search import exact_bm25_topk

    # identical bags of words, different adjacency: BM25 ties them;
    # proximity must rank the adjacent one first
    rows = [
        (1, "alpha beta filler filler filler filler", "s"),
        (2, "alpha filler filler filler filler beta", "s"),
        (3, "no relevant words at all here", "s"),
    ]
    docs = _docs_df(spark, rows)
    qs = _queries(spark, [(0, "alpha beta")])
    plain = exact_bm25_topk(docs, qs, k=10).collect()
    s = {r["doc_id"]: round(r["score"], 6) for r in plain}
    assert s[1] == s[2]  # pure BM25 cannot separate them
    prox = sorted(
        proximity_bm25_topk(docs, qs, k=10, prox_weight=2.0).collect(),
        key=lambda r: r["rank"],
    )
    assert [r["doc_id"] for r in prox[:2]] == [1, 2]
    # adjacent pair: dmin=1 -> boost 2*(1/2)=1.0; far pair: dmin=5 -> 2/6
    assert prox[0]["score"] - prox[1]["score"] == pytest.approx(1.0 - 2.0 / 6.0, abs=1e-6)

    with pytest.raises(ValueError):
        proximity_bm25_topk(docs, qs, prox_weight=-1.0)


def test_proximity_indexed_rank_identical(spark, tmp_path):
    from igd_spark import (IndexConf, assign_doc_ids, build_index,
                           proximity_bm25_topk, proximity_bm25_topk_indexed)
    from igd_spark.corpus import synth_transcripts

    conf = IndexConf(block_size=32, n_shards=8, store_positions=True)
    docs = assign_doc_ids(synth_transcripts(spark, n_convs=80, seed=4), conf)
    idx = build_index(spark, docs, str(tmp_path / "pidx"), conf=conf)
    qs = _queries(spark, [(0, "error timeout"), (1, "merge sort"), (2, "zz")])
    a = sorted(
        (r["query_id"], r["rank"], r["doc_id"], r["score"])
        for r in proximity_bm25_topk(docs, qs, k=7, round_dp=6).collect()
    )
    b = sorted(
        (r["query_id"], r["rank"], r["doc_id"], r["score"])
        for r in proximity_bm25_topk_indexed(spark, idx, qs, k=7, round_dp=6).collect()
    )
    assert a == b and len(a) > 0


def test_prf_indexed_rank_identical(spark, tmp_path):
    from igd_spark import (IndexConf, assign_doc_ids, build_index,
                           prf_bm25_topk, prf_bm25_topk_indexed)
    from igd_spark.corpus import synth_transcripts

    conf = IndexConf(block_size=32, n_shards=8)
    docs = assign_doc_ids(synth_transcripts(spark, n_convs=80, seed=4), conf)
    idx = build_index(spark, docs, str(tmp_path / "prfidx"), conf=conf)
    qs = _queries(spark, [(0, "error timeout"), (1, "merge sort"), (2, "zz")])
    a = sorted(
        (r["query_id"], r["rank"], r["doc_id"], r["score"])
        for r in prf_bm25_topk(
            docs, qs, k=7, fb_docs=4, fb_terms=4, round_dp=6
        ).collect()
    )
    b = sorted(
        (r["query_id"], r["rank"], r["doc_id"], r["score"])
        for r in prf_bm25_topk_indexed(
            spark, idx, docs, qs, k=7, fb_docs=4, fb_terms=4, round_dp=6
        ).collect()
    )
    assert a == b and len(a) > 0
