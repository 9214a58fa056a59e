"""Round-5 metric aggregations (igd_spark/aggs.py): extended_stats /
boxplot / median_absolute_deviation / matrix_stats / top_metrics —
brute-force semantics on the synthetic transcript corpus plus the
corpus-vs-indexed identity every *_indexed twin must hold."""

from __future__ import annotations

import math
import statistics

import pytest
from pyspark.sql import functions as F

from igd_spark import (
    boxplot_agg,
    boxplot_agg_indexed,
    extended_stats_agg,
    extended_stats_agg_indexed,
    matrix_stats_agg,
    matrix_stats_agg_indexed,
    median_absolute_deviation_agg,
    median_absolute_deviation_agg_indexed,
    top_metrics_agg,
    top_metrics_agg_indexed,
)
from igd_spark.corpus import assign_doc_ids
from igd_spark.stats import term_stats
from igd_spark.tokenizer import postings


@pytest.fixture(scope="module")
def docs(spark, tiny_docs):
    d = assign_doc_ids(tiny_docs).withColumn(
        "y2", (F.col("doc_id") % 7).cast("double")
    )
    return d.cache()


@pytest.fixture(scope="module")
def agg_idx(spark, docs, tmp_path_factory):
    from igd_spark import IndexConf, build_index

    conf = IndexConf(block_size=32, n_shards=8, salt_df_threshold=64, max_salts=4)
    path = str(tmp_path_factory.mktemp("aggidx5") / "idx")
    return build_index(spark, docs, path, conf=conf)


def _queries(spark, rows):
    return spark.createDataFrame(rows, "query_id long, query_text string")


def _mid_term(docs):
    ts = term_stats(postings(docs)).filter((F.col("df") >= 10) & (F.col("df") <= 60))
    return ts.orderBy("term").limit(1).collect()[0]["term"]


def _match_vals(docs, term, col="turn_idx"):
    ids = {
        r["doc_id"]
        for r in postings(docs).filter(F.col("term") == term).select("doc_id").collect()
    }
    return [
        (r["doc_id"], float(r[col]))
        for r in docs.select("doc_id", col).collect()
        if r["doc_id"] in ids and r[col] is not None
    ]


def _interp_quantile(sorted_vals, frac):
    # linear interpolation at index frac*(n-1): Spark percentile ==
    # DuckDB quantile_cont
    n = len(sorted_vals)
    pos = frac * (n - 1)
    lo = int(math.floor(pos))
    hi = int(math.ceil(pos))
    if lo == hi:
        return sorted_vals[lo]
    return sorted_vals[lo] + (pos - lo) * (sorted_vals[hi] - sorted_vals[lo])


def test_extended_stats_bruteforce(spark, docs):
    term = _mid_term(docs)
    vals = [v for _, v in _match_vals(docs, term)]
    row = extended_stats_agg(docs, _queries(spark, [(0, term)]), "turn_idx").collect()[0]
    n = len(vals)
    mean = sum(vals) / n
    var_pop = sum((v - mean) ** 2 for v in vals) / n
    assert row["n_docs"] == n
    assert row["sum_sq"] == pytest.approx(sum(v * v for v in vals))
    assert row["variance"] == pytest.approx(var_pop)
    assert row["std_dev"] == pytest.approx(math.sqrt(var_pop))
    assert row["std_upper"] == pytest.approx(mean + 2.0 * math.sqrt(var_pop))
    assert row["std_lower"] == pytest.approx(mean - 2.0 * math.sqrt(var_pop))


def test_boxplot_bruteforce(spark, docs):
    term = _mid_term(docs)
    vals = sorted(v for _, v in _match_vals(docs, term))
    row = boxplot_agg(docs, _queries(spark, [(0, term)]), "turn_idx").collect()[0]
    assert row["min_v"] == pytest.approx(vals[0])
    assert row["max_v"] == pytest.approx(vals[-1])
    for col, frac in (("q1", 0.25), ("q2", 0.5), ("q3", 0.75)):
        assert row[col] == pytest.approx(_interp_quantile(vals, frac)), col


def test_mad_bruteforce(spark, docs):
    term = _mid_term(docs)
    vals = sorted(v for _, v in _match_vals(docs, term))
    med = _interp_quantile(vals, 0.5)
    devs = sorted(abs(v - med) for v in vals)
    row = median_absolute_deviation_agg(
        docs, _queries(spark, [(0, term)]), "turn_idx"
    ).collect()[0]
    assert row["median_v"] == pytest.approx(med)
    assert row["mad"] == pytest.approx(_interp_quantile(devs, 0.5))


def test_matrix_stats_bruteforce(spark, docs):
    term = _mid_term(docs)
    xs = _match_vals(docs, term, "turn_idx")
    ys = dict(_match_vals(docs, term, "y2"))
    pairs = [(x, ys[i]) for i, x in xs if i in ys]
    row = matrix_stats_agg(
        docs, _queries(spark, [(0, term)]), "turn_idx", "y2"
    ).collect()[0]
    n = len(pairs)
    mx = sum(p[0] for p in pairs) / n
    my = sum(p[1] for p in pairs) / n
    cov = sum((p[0] - mx) * (p[1] - my) for p in pairs) / (n - 1)
    assert row["n_docs"] == n
    assert row["mean_x"] == pytest.approx(mx)
    assert row["mean_y"] == pytest.approx(my)
    assert row["var_x"] == pytest.approx(statistics.variance(p[0] for p in pairs))
    assert row["var_y"] == pytest.approx(statistics.variance(p[1] for p in pairs))
    assert row["covariance"] == pytest.approx(cov)
    sx = math.sqrt(statistics.variance(p[0] for p in pairs))
    sy = math.sqrt(statistics.variance(p[1] for p in pairs))
    assert row["correlation"] == pytest.approx(cov / (sx * sy))


def test_top_metrics_order_and_ties(spark, docs):
    term = _mid_term(docs)
    xs = _match_vals(docs, term, "turn_idx")
    ys = dict(_match_vals(docs, term, "y2"))
    expect = sorted(xs, key=lambda p: (-p[1], p[0]))[:3]
    out = top_metrics_agg(
        docs, _queries(spark, [(0, term)]), "turn_idx", "y2", k=3
    ).orderBy("rank").collect()
    assert [(r["doc_id"], r["sort_v"]) for r in out] == [
        (i, v) for i, v in expect
    ]
    for r in out:
        assert r["metric_v"] == ys[r["doc_id"]]
    # ascending flips the order
    asc = top_metrics_agg(
        docs, _queries(spark, [(0, term)]), "turn_idx", "y2", k=1, ascending=True
    ).collect()[0]
    assert asc["sort_v"] == min(v for _, v in xs)


def test_metric_aggs_indexed_identity(spark, docs, agg_idx):
    import pandas as pd

    term = _mid_term(docs)
    q = _queries(spark, [(0, term), (1, f"{term} zzznotavocab")])
    conf = agg_idx.conf

    def srt(df):
        return df.toPandas().sort_values(list(df.columns)).reset_index(drop=True)

    pairs = [
        (extended_stats_agg(docs, q, "turn_idx", conf=conf, round_dp=6),
         extended_stats_agg_indexed(spark, agg_idx, docs, q, "turn_idx",
                                    round_dp=6)),
        (boxplot_agg(docs, q, "turn_idx", conf=conf, round_dp=6),
         boxplot_agg_indexed(spark, agg_idx, docs, q, "turn_idx", round_dp=6)),
        (median_absolute_deviation_agg(docs, q, "turn_idx", conf=conf,
                                       round_dp=6),
         median_absolute_deviation_agg_indexed(spark, agg_idx, docs, q,
                                               "turn_idx", round_dp=6)),
        (matrix_stats_agg(docs, q, "turn_idx", "y2", conf=conf, round_dp=6),
         matrix_stats_agg_indexed(spark, agg_idx, docs, q, "turn_idx", "y2",
                                  round_dp=6)),
        (top_metrics_agg(docs, q, "turn_idx", "y2", k=3, conf=conf,
                         round_dp=6),
         top_metrics_agg_indexed(spark, agg_idx, docs, q, "turn_idx", "y2",
                                 k=3, round_dp=6)),
    ]
    for a, b in pairs:
        pd.testing.assert_frame_equal(srt(a), srt(b), check_dtype=False)


def test_string_stats_bruteforce(spark, docs):
    from collections import Counter

    from igd_spark import string_stats_agg

    term = _mid_term(docs)
    svals = [
        r["role"]
        for r in docs.select("doc_id", "role").collect()
        if r["doc_id"] in {
            p["doc_id"]
            for p in postings(docs).filter(F.col("term") == term)
            .select("doc_id").collect()
        } and r["role"] is not None
    ]
    row = string_stats_agg(docs, _queries(spark, [(0, term)]), "role").collect()[0]
    assert row["n_docs"] == len(svals)
    assert row["min_len"] == min(len(s) for s in svals)
    assert row["max_len"] == max(len(s) for s in svals)
    assert row["avg_len"] == pytest.approx(
        sum(len(s) for s in svals) / len(svals)
    )
    counts = Counter("".join(svals))
    tot = sum(counts.values())
    ent = -sum((c / tot) * math.log2(c / tot) for c in counts.values())
    assert row["entropy"] == pytest.approx(ent)


def test_string_stats_indexed_identity(spark, docs, agg_idx):
    import pandas as pd

    from igd_spark import string_stats_agg, string_stats_agg_indexed

    term = _mid_term(docs)
    q = _queries(spark, [(0, term), (1, f"{term} zzznotavocab")])
    a = string_stats_agg(docs, q, "role", conf=agg_idx.conf, round_dp=6)
    b = string_stats_agg_indexed(spark, agg_idx, docs, q, "role", round_dp=6)

    def srt(df):
        return df.toPandas().sort_values(list(df.columns)).reset_index(drop=True)

    pd.testing.assert_frame_equal(srt(a), srt(b), check_dtype=False)


def test_scripted_metric_bruteforce(spark, docs):
    from igd_spark import scripted_metric_agg

    term = _mid_term(docs)
    vals = [v for _, v in _match_vals(docs, term)]
    for reduce, ref in (
        ("sum", sum(v * 2 + 1 for v in vals)),
        ("avg", sum(v * 2 + 1 for v in vals) / len(vals)),
        ("min", min(v * 2 + 1 for v in vals)),
        ("max", max(v * 2 + 1 for v in vals)),
    ):
        row = scripted_metric_agg(
            docs, _queries(spark, [(0, term)]), "turn_idx * 2 + 1", reduce=reduce
        ).collect()[0]
        assert row["value"] == pytest.approx(ref), reduce


def test_scripted_metric_rejects_unknown_reduce(spark, docs):
    from igd_spark import scripted_metric_agg

    with pytest.raises(ValueError, match="reduce"):
        scripted_metric_agg(
            docs, _queries(spark, [(0, "x")]), "turn_idx", reduce="median"
        ).collect()


def test_scripted_metric_indexed_identity(spark, docs, agg_idx):
    import pandas as pd

    from igd_spark import scripted_metric_agg, scripted_metric_agg_indexed

    term = _mid_term(docs)
    q = _queries(spark, [(0, term), (1, f"{term} zzznotavocab")])
    a = scripted_metric_agg(
        docs, q, "sqrt(turn_idx + 1) + y2", reduce="avg",
        conf=agg_idx.conf, round_dp=6,
    )
    b = scripted_metric_agg_indexed(
        spark, agg_idx, docs, q, "sqrt(turn_idx + 1) + y2", reduce="avg",
        round_dp=6,
    )

    def srt(df):
        return df.toPandas().sort_values(list(df.columns)).reset_index(drop=True)

    pd.testing.assert_frame_equal(srt(a), srt(b), check_dtype=False)
