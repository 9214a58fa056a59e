"""ES-aggregation family (igd_spark/aggs.py): brute-force semantics checks
on the synthetic transcript corpus — match-set definition shared with
retrieval, NULL handling, exact-vs-approx cardinality, JLH positivity,
and null-safe top-hits bucketing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from igd_spark import (
    cardinality_agg,
    histogram_agg,
    significant_terms,
    stats_agg,
    top_hits_agg,
)
from igd_spark.corpus import assign_doc_ids
from igd_spark.search import bm25_scores
from igd_spark.stats import term_stats
from igd_spark.tokenizer import postings


@pytest.fixture(scope="module")
def docs(spark, tiny_docs):
    # turn_idx is the numeric agg field; tool is nullable (NULL bucket)
    return assign_doc_ids(tiny_docs).cache()


def _queries(spark, rows):
    return spark.createDataFrame(rows, "query_id long, query_text string")


def _mid_term(docs):
    ts = term_stats(postings(docs)).filter((F.col("df") >= 10) & (F.col("df") <= 60))
    return ts.orderBy("term").limit(1).collect()[0]["term"]


def _match_ids(docs, term):
    return {
        r["doc_id"]
        for r in postings(docs).filter(F.col("term") == term).select("doc_id").collect()
    }


def test_stats_agg_bruteforce(spark, docs):
    term = _mid_term(docs)
    ids = _match_ids(docs, term)
    vals = [
        r["turn_idx"]
        for r in docs.select("doc_id", "turn_idx").collect()
        if r["doc_id"] in ids and r["turn_idx"] is not None
    ]
    out = stats_agg(docs, _queries(spark, [(0, term)]), "turn_idx").collect()
    assert len(out) == 1
    row = out[0]
    assert row["n_docs"] == len(vals)
    assert row["min_v"] == min(vals)
    assert row["max_v"] == max(vals)
    assert row["sum_v"] == pytest.approx(sum(vals))
    assert row["avg_v"] == pytest.approx(sum(vals) / len(vals))


def test_histogram_buckets_partition_match_set(spark, docs):
    term = _mid_term(docs)
    ids = _match_ids(docs, term)
    out = histogram_agg(docs, _queries(spark, [(0, term)]), "turn_idx", 3.0).collect()
    # buckets partition the valued match set: counts sum to |match set|
    assert sum(r["n_docs"] for r in out) == len(ids)
    for r in out:
        assert r["bucket"] % 3.0 == 0.0


def test_histogram_rejects_bad_interval(spark, docs):
    with pytest.raises(ValueError):
        histogram_agg(docs, _queries(spark, [(0, "x")]), "turn_idx", 0.0)


def test_cardinality_exact_and_approx(spark, docs):
    term = _mid_term(docs)
    ids = _match_ids(docs, term)
    roles = {
        r["role"]
        for r in docs.select("doc_id", "role").collect()
        if r["doc_id"] in ids and r["role"] is not None
    }
    q = _queries(spark, [(0, term)])
    exact = cardinality_agg(docs, q, "role").collect()[0]["cardinality"]
    assert exact == len(roles)
    approx = cardinality_agg(docs, q, "role", approx=True).collect()[0]["cardinality"]
    # role cardinality is tiny — HLL++ is exact at this scale
    assert abs(approx - exact) <= max(1, exact // 5)


def test_significant_terms_jlh(spark, docs):
    term = _mid_term(docs)
    out = significant_terms(docs, _queries(spark, [(0, term)]), k=10).collect()
    assert out, "query term itself must be significant"
    n_docs = docs.count()
    subset = len(_match_ids(docs, term))
    by_term = {r["term"]: r for r in out}
    # the searched term has fg_pct = 1.0 — maximal lift, must appear
    assert term in by_term
    for r in out:
        fg_pct = r["fg_df"] / subset
        bg_pct = r["df"] / n_docs
        assert fg_pct > bg_pct, "only positively significant terms emitted"
        assert r["score"] > 0.0
    # ranks are 1..n by (score desc, term asc)
    ranks = sorted(r["rank"] for r in out)
    assert ranks == list(range(1, len(out) + 1))


def test_top_hits_null_safe_buckets(spark, docs):
    term = _mid_term(docs)
    q = _queries(spark, [(0, term)])
    out = top_hits_agg(docs, q, "tool", k_buckets=3, k_hits=2, round_dp=6).collect()
    assert out
    # NULL tool is a real bucket in this corpus (non-tool turns) and must
    # survive the null-safe join
    facets = {r["facet"] for r in out}
    tools = {r["tool"] for r in docs.select("tool").distinct().collect()}
    if None in tools:
        assert None in facets or len(facets) == 3  # NULL bucket kept unless outranked
    # hit ordering inside each bucket follows (score desc, doc_id asc)
    scored = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in bm25_scores(docs, q).withColumn("score", F.round("score", 6)).collect()
    }
    from collections import defaultdict

    per_bucket = defaultdict(list)
    for r in out:
        assert r["facet_rank"] <= 3 and r["hit_rank"] <= 2
        assert scored[(r["query_id"], r["doc_id"])] == r["score"]
        per_bucket[(r["query_id"], r["facet"])].append(r)
    for rows in per_bucket.values():
        rows.sort(key=lambda r: r["hit_rank"])
        keys = [(-r["score"], r["doc_id"]) for r in rows]
        assert keys == sorted(keys)


@pytest.fixture(scope="module")
def agg_idx(spark, docs, tmp_path_factory):
    from igd_spark import IndexConf, build_index

    conf = IndexConf(block_size=32, n_shards=8, salt_df_threshold=64, max_salts=4)
    path = str(tmp_path_factory.mktemp("aggidx") / "idx")
    return build_index(spark, docs, path, conf=conf)


def test_indexed_agg_identity(spark, docs, agg_idx):
    """Every *_indexed aggregation must equal its corpus-path twin row for
    row — same discipline as the retrieval matrix."""
    import pandas as pd

    from igd_spark import (
        cardinality_agg_indexed,
        histogram_agg_indexed,
        significant_terms_indexed,
        stats_agg_indexed,
        top_hits_agg_indexed,
    )

    term = _mid_term(docs)
    q = _queries(spark, [(0, term), (1, f"{term} zzznotavocab")])
    conf = agg_idx.conf

    def srt(df):
        return df.toPandas().sort_values(list(df.columns)).reset_index(drop=True)

    pairs = [
        (stats_agg(docs, q, "turn_idx", conf=conf, round_dp=6),
         stats_agg_indexed(spark, agg_idx, docs, q, "turn_idx", round_dp=6)),
        (histogram_agg(docs, q, "turn_idx", 3.0, conf=conf),
         histogram_agg_indexed(spark, agg_idx, docs, q, "turn_idx", 3.0)),
        (cardinality_agg(docs, q, "role", conf=conf),
         cardinality_agg_indexed(spark, agg_idx, docs, q, "role")),
        (significant_terms(docs, q, k=5, min_fg=2, conf=conf, round_dp=6),
         significant_terms_indexed(spark, agg_idx, docs, q, k=5, min_fg=2,
                                   round_dp=6)),
        (top_hits_agg(docs, q, "role", k_buckets=2, k_hits=2, conf=conf,
                      round_dp=6),
         top_hits_agg_indexed(spark, agg_idx, docs, q, "role", k_buckets=2,
                              k_hits=2, round_dp=6)),
    ]
    for a, b in pairs:
        pd.testing.assert_frame_equal(srt(a), srt(b), check_dtype=False)


def test_search_after_rescore_indexed_identity(spark, docs, agg_idx):
    import pandas as pd

    from igd_spark import (
        rescore_topk,
        rescore_topk_indexed,
        search_after_topk,
        search_after_topk_indexed,
    )

    term = _mid_term(docs)
    q = _queries(spark, [(0, term)])
    conf = agg_idx.conf
    empty = spark.createDataFrame(
        [], "query_id long, after_score double, after_doc_id long"
    )

    def srt(df):
        return df.toPandas().sort_values(list(df.columns)).reset_index(drop=True)

    a = srt(search_after_topk(docs, q, empty, k=7, conf=conf, round_dp=6))
    b = srt(search_after_topk_indexed(spark, agg_idx, q, empty, k=7, round_dp=6))
    pd.testing.assert_frame_equal(a, b, check_dtype=False)

    c = srt(rescore_topk(docs, q, window_size=9, rescore_weight=2.0, k=5,
                         conf=conf, round_dp=6))
    d = srt(rescore_topk_indexed(spark, agg_idx, q, window_size=9,
                                 rescore_weight=2.0, k=5, round_dp=6))
    pd.testing.assert_frame_equal(c, d, check_dtype=False)


def test_range_agg_semantics(spark, docs):
    """ES range contract: [from, to) bounds, overlapping ranges double-count,
    every requested (query, range) pair emitted — zero counts included."""
    from igd_spark import range_agg

    term = _mid_term(docs)
    q = _queries(spark, [(0, term), (1, "zzznotavocab")])
    ranges = [(None, 3.0), (2.0, 6.0), (2.0, None)]  # overlapping, open ends
    out = range_agg(docs, q, "turn_idx", ranges).toPandas()
    # full grid: 2 queries x 3 ranges, zero rows present for the OOV query
    assert len(out) == 6
    assert (out[out["query_id"] == 1]["n_docs"] == 0).all()

    vals = {
        r["doc_id"]: r["turn_idx"]
        for r in docs.select("doc_id", "turn_idx").collect()
    }
    hits = _match_ids(docs, term)
    for lo, hi in ranges:
        exp = sum(
            1 for d in hits
            if (lo is None or vals[d] >= lo) and (hi is None or vals[d] < hi)
        )
        row = out[
            (out["query_id"] == 0)
            & (out["range_from"].isna() if lo is None else (out["range_from"] == lo))
            & (out["range_to"].isna() if hi is None else (out["range_to"] == hi))
        ]
        assert len(row) == 1 and int(row["n_docs"].iloc[0]) == exp


def test_range_agg_indexed_identity(spark, docs, agg_idx):
    import pandas as pd

    from igd_spark import range_agg, range_agg_indexed

    term = _mid_term(docs)
    q = _queries(spark, [(0, term)])
    ranges = [(None, 4.0), (4.0, None)]
    a = range_agg(docs, q, "turn_idx", ranges).toPandas()
    b = range_agg_indexed(spark, agg_idx, docs, q, "turn_idx", ranges).toPandas()
    key = ["query_id", "range_from", "range_to"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True),
        check_dtype=False,
    )

    with pytest.raises(ValueError):
        range_agg(docs, q, "turn_idx", [])


def test_adjacency_matrix_semantics(spark, docs):
    """Diagonal = each query's own match count; off-diagonal = exact
    intersection size; upper triangle only, empty cells omitted."""
    from igd_spark import adjacency_matrix_agg

    ts = term_stats(postings(docs)).filter(
        (F.col("df") >= 10) & (F.col("df") <= 60)
    )
    t1, t2 = [r["term"] for r in ts.orderBy("term").limit(2).collect()]
    q = _queries(spark, [(0, t1), (1, t2), (2, "zzznotavocab")])
    out = adjacency_matrix_agg(docs, q).toPandas()
    s1, s2 = _match_ids(docs, t1), _match_ids(docs, t2)

    def cell(a, b):
        rows = out[(out["query_a"] == a) & (out["query_b"] == b)]
        return int(rows["n_docs"].iloc[0]) if len(rows) else 0

    assert cell(0, 0) == len(s1) and cell(1, 1) == len(s2)
    assert cell(0, 1) == len(s1 & s2)
    assert (out["query_a"] <= out["query_b"]).all()
    # the OOV query appears nowhere (empty match set)
    assert not ((out["query_a"] == 2) | (out["query_b"] == 2)).any()


def test_missing_agg_and_indexed_identity(spark, docs, agg_idx):
    import pandas as pd

    from igd_spark import (
        adjacency_matrix_agg,
        adjacency_matrix_agg_indexed,
        missing_agg,
        missing_agg_indexed,
    )

    term = _mid_term(docs)
    q = _queries(spark, [(0, term)])
    # tool is the transcript fixture's nullable column
    out = missing_agg(docs, q, "tool").toPandas()
    null_ids = {
        r["doc_id"] for r in docs.filter(F.col("tool").isNull()).select("doc_id").collect()
    }
    exp = len(_match_ids(docs, term) & null_ids)
    if exp == 0:
        assert len(out) == 0
    else:
        assert len(out) == 1 and int(out["n_missing"].iloc[0]) == exp

    b = missing_agg_indexed(spark, agg_idx, docs, q, "tool").toPandas()
    pd.testing.assert_frame_equal(
        out.sort_values("query_id").reset_index(drop=True),
        b.sort_values("query_id").reset_index(drop=True),
        check_dtype=False,
    )
    q2 = _queries(spark, [(0, term), (1, "the")])
    a2 = adjacency_matrix_agg(docs, q2).toPandas()
    b2 = adjacency_matrix_agg_indexed(spark, agg_idx, q2).toPandas()
    key = ["query_a", "query_b"]
    pd.testing.assert_frame_equal(
        a2.sort_values(key).reset_index(drop=True),
        b2.sort_values(key).reset_index(drop=True),
        check_dtype=False,
    )


def test_composite_keyset_pagination(spark, docs):
    """composite: page 1 and the after-cursor page are disjoint, contiguous
    in key order, and together equal the first 2·size buckets of the full
    key-ordered bucket list; NULL source values are skipped."""
    from igd_spark import composite_agg

    term = _mid_term(docs)
    q = _queries(spark, [(0, term)])
    d = docs.withColumn(
        "grp", F.when(F.col("turn_idx") == 0, None).otherwise(
            F.concat(F.lit("g"), (F.col("turn_idx") % 4).cast("string"))
        )
    ).withColumn("role2", F.col("role"))
    size = 3
    full = composite_agg(d, q, sources=["grp", "role2"], size=10_000)
    allb = sorted(
        ((r["grp"], r["role2"]), r["n_docs"]) for r in full.collect()
    )
    assert all(k[0] is not None for k, _ in allb)  # NULLs skipped
    p1 = composite_agg(d, q, sources=["grp", "role2"], size=size)
    k1 = sorted((r["grp"], r["role2"]) for r in p1.collect())
    cursor = k1[-1]
    p2 = composite_agg(d, q, sources=["grp", "role2"], size=size, after=cursor)
    k2 = sorted((r["grp"], r["role2"]) for r in p2.collect())
    assert not (set(k1) & set(k2))
    assert k1 + k2 == [k for k, _ in allb[: 2 * size]]
    assert all(k > cursor for k in k2)  # strictly after, lexicographic


def test_composite_indexed_identity(spark, docs, tmp_path_factory):
    from igd_spark import IndexConf, build_index, composite_agg, composite_agg_indexed

    conf = IndexConf(block_size=32, n_shards=8)
    path = str(tmp_path_factory.mktemp("caggidx") / "idx")
    idx = build_index(spark, docs, path, conf=conf)
    q = _queries(spark, [(0, _mid_term(docs)), (1, "error timeout")])
    a = sorted(
        map(tuple, composite_agg(docs, q, sources=["role"], size=5).collect())
    )
    b = sorted(
        map(
            tuple,
            composite_agg_indexed(
                spark, idx, docs, q, sources=["role"], size=5
            ).collect(),
        )
    )
    assert a == b and len(a) > 0


def test_filters_agg_complete_grid(spark, docs):
    """filters: every named bucket appears for every query (zero counts
    included), counts equal brute force."""
    from igd_spark import filters_agg

    term = _mid_term(docs)
    q = _queries(spark, [(0, term), (1, "zzznotaterm")])
    flt = {"f_user": "role = 'user'", "f_never": "turn_idx < 0"}
    out = {
        (r["query_id"], r["filter_name"]): r["n_docs"]
        for r in filters_agg(docs, q, flt).collect()
    }
    assert set(out) == {(0, "f_user"), (0, "f_never"), (1, "f_user"), (1, "f_never")}
    assert out[(1, "f_user")] == 0 and out[(0, "f_never")] == 0
    m = _match_ids(docs, term)
    want = docs.filter(
        F.col("doc_id").isin(list(m)) & (F.col("role") == "user")
    ).count()
    assert out[(0, "f_user")] == want


def test_rare_terms_bruteforce(spark, docs):
    from collections import Counter

    from igd_spark import rare_terms_agg

    term = _mid_term(docs)
    ids = _match_ids(docs, term)
    tools = {
        r["doc_id"]: r["tool"]
        for r in docs.select("doc_id", "tool").collect()
        if r["tool"] is not None
    }
    counts = Counter(tools[d] for d in ids if d in tools)
    for mdc in (1, 2, 5):
        out = rare_terms_agg(docs, _queries(spark, [(0, term)]), "tool", mdc).collect()
        assert {(r["value"], r["n_docs"]) for r in out} == {
            (v, c) for v, c in counts.items() if c <= mdc
        }
    with pytest.raises(ValueError):
        rare_terms_agg(docs, _queries(spark, [(0, term)]), "tool", 0)


def test_multi_terms_bruteforce(spark, docs):
    from collections import Counter

    from igd_spark import multi_terms_agg

    term = _mid_term(docs)
    ids = _match_ids(docs, term)
    rows = {
        r["doc_id"]: (r["role"], r["tool"])
        for r in docs.select("doc_id", "role", "tool").collect()
    }
    counts = Counter(
        rows[d] for d in ids if rows[d][0] is not None and rows[d][1] is not None
    )
    expect = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:4]
    out = multi_terms_agg(
        docs, _queries(spark, [(0, term)]), ["role", "tool"], size=4
    ).collect()
    got = [((r["role"], r["tool"]), r["n_docs"]) for r in sorted(out, key=lambda r: r["rank"])]
    assert got == expect
    with pytest.raises(ValueError):
        multi_terms_agg(docs, _queries(spark, [(0, term)]), [], size=4)


def test_weighted_avg_bruteforce(spark, docs):
    from igd_spark import weighted_avg_agg

    term = _mid_term(docs)
    ids = _match_ids(docs, term)
    rows = {
        r["doc_id"]: r["turn_idx"]
        for r in docs.select("doc_id", "turn_idx").collect()
    }
    num = sum(rows[d] * (1 + d % 3) for d in ids if rows[d] is not None)
    den = sum((1 + d % 3) for d in ids if rows[d] is not None)
    out = weighted_avg_agg(
        docs, _queries(spark, [(0, term)]), "turn_idx", "1 + doc_id % 3"
    ).collect()
    assert len(out) == 1
    assert out[0]["weighted_avg"] == pytest.approx(num / den)
    assert out[0]["n_docs"] == sum(1 for d in ids if rows[d] is not None)


def test_rare_multi_wavg_indexed_identity(spark, docs, agg_idx):
    from igd_spark import (
        multi_terms_agg,
        multi_terms_agg_indexed,
        rare_terms_agg,
        rare_terms_agg_indexed,
        weighted_avg_agg,
        weighted_avg_agg_indexed,
    )

    q = _queries(spark, [(0, _mid_term(docs)), (1, "error timeout")])
    a = rare_terms_agg(docs, q, "tool", 2, conf=agg_idx.conf).collect()
    b = rare_terms_agg_indexed(spark, agg_idx, docs, q, "tool", 2).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    a = multi_terms_agg(docs, q, ["role", "tool"], size=5, conf=agg_idx.conf).collect()
    b = multi_terms_agg_indexed(spark, agg_idx, docs, q, ["role", "tool"], size=5).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    a = weighted_avg_agg(
        docs, q, "turn_idx", "1 + doc_id % 3", conf=agg_idx.conf, round_dp=6
    ).collect()
    b = weighted_avg_agg_indexed(
        spark, agg_idx, docs, q, "turn_idx", "1 + doc_id % 3", round_dp=6
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_sampler_terms_agg(spark, docs, agg_idx):
    from igd_spark import sampler_terms_agg, sampler_terms_agg_indexed
    from igd_spark.search import bm25_scores

    q = _queries(spark, [(0, "error timeout")])
    # brute force: top-5 by (rounded score desc, doc_id asc), bucket by tool
    scored = sorted(
        ((round(r["score"], 6), r["doc_id"]) for r in bm25_scores(docs, q).collect()),
        key=lambda t: (-t[0], t[1]),
    )
    tools = {r["doc_id"]: r["tool"] for r in docs.select("doc_id", "tool").collect()}
    from collections import Counter

    head = [d for _, d in scored if tools.get(d) is not None][:5]
    expect = Counter(tools[d] for d in head)
    out = sampler_terms_agg(docs, q, "tool", shard_size=5).collect()
    assert {(r["value"], r["n_docs"]) for r in out} == set(expect.items())

    # diversified: per-value cap binds
    div = sampler_terms_agg(
        docs, q, "tool", shard_size=5, max_docs_per_value=1
    ).collect()
    assert all(r["n_docs"] == 1 for r in div)
    assert len(div) == min(5, len({tools[d] for _, d in scored if tools.get(d)}))

    # indexed identity
    a = sampler_terms_agg(docs, q, "tool", shard_size=7, conf=agg_idx.conf).collect()
    b = sampler_terms_agg_indexed(spark, agg_idx, docs, q, "tool", shard_size=7).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    with pytest.raises(ValueError):
        sampler_terms_agg(docs, q, "tool", shard_size=0)
    with pytest.raises(ValueError):
        sampler_terms_agg(docs, q, "tool", max_docs_per_value=0)


def test_percentile_ranks_bruteforce_and_indexed(spark, docs, agg_idx):
    from igd_spark import percentile_ranks_agg, percentile_ranks_agg_indexed

    term = _mid_term(docs)
    ids = _match_ids(docs, term)
    vals = [
        r["turn_idx"]
        for r in docs.select("doc_id", "turn_idx").collect()
        if r["doc_id"] in ids and r["turn_idx"] is not None
    ]
    cuts = [1.0, 3.0]
    out = percentile_ranks_agg(
        docs, _queries(spark, [(0, term)]), "turn_idx", cuts
    ).collect()
    got = {r["value"]: r["rank_pct"] for r in out}
    for c in cuts:
        expect = 100.0 * sum(1 for v in vals if v <= c) / len(vals)
        assert got[c] == pytest.approx(expect)
    a = percentile_ranks_agg(
        docs, _queries(spark, [(0, term)]), "turn_idx", cuts,
        conf=agg_idx.conf, round_dp=6,
    ).collect()
    b = percentile_ranks_agg_indexed(
        spark, agg_idx, docs, _queries(spark, [(0, term)]), "turn_idx", cuts,
        round_dp=6,
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    with pytest.raises(ValueError):
        percentile_ranks_agg(docs, _queries(spark, [(0, term)]), "turn_idx", [])
