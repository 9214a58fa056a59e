"""rank_eval (the ES _rank_eval surface): hand-computed metric checks."""

from __future__ import annotations

import math

import pytest

from igd_spark import rank_eval


def _res(spark, rows):
    return spark.createDataFrame(rows, "query_id long, rank int, doc_id long")


def _jd(spark, rows):
    return spark.createDataFrame(rows, "query_id long, doc_id long, grade int")


def test_rank_eval_hand_computed(spark):
    # q0: ranks 1..4 = docs 10,11,12,13; judged: 10→2, 12→1, 14→3 (missed)
    res = _res(spark, [(0, 1, 10), (0, 2, 11), (0, 3, 12), (0, 4, 13)])
    jd = _jd(spark, [(0, 10, 2), (0, 12, 1), (0, 14, 3), (0, 11, 0)])
    out = {r["query_id"]: r for r in rank_eval(res, jd, k=4).collect()}
    r = out[0]
    assert r["n_retrieved"] == 4
    assert r["n_relevant"] == 3          # grades >= 1: docs 10, 12, 14
    assert r["precision"] == pytest.approx(2 / 4)
    assert r["recall"] == pytest.approx(2 / 3)
    assert r["mrr"] == pytest.approx(1.0)  # first relevant at rank 1
    dcg = (2**2 - 1) / math.log2(2) + (2**0 - 1) / math.log2(3) + (2**1 - 1) / math.log2(4)
    # ideal ordering of judged docs by grade desc: 14(3), 10(2), 12(1), 11(0)
    idcg = (2**3 - 1) / math.log2(2) + (2**2 - 1) / math.log2(3) + (2**1 - 1) / math.log2(4)
    assert r["ndcg"] == pytest.approx(dcg / idcg, abs=1e-12)


def test_rank_eval_edge_cases(spark):
    # q1: no judgments at all -> all-zero row, not silence
    # q2: retrieved but only grade-0 judgments -> zero metrics
    res = _res(spark, [(1, 1, 20), (2, 1, 30), (2, 2, 31)])
    jd = _jd(spark, [(2, 30, 0), (2, 31, 0)])
    out = {r["query_id"]: r for r in rank_eval(res, jd, k=10).collect()}
    assert set(out) == {1, 2}
    for qid in (1, 2):
        r = out[qid]
        assert r["precision"] == 0.0 and r["recall"] == 0.0
        assert r["mrr"] == 0.0 and r["ndcg"] == 0.0
    with pytest.raises(ValueError):
        rank_eval(res, jd, k=0)


def test_rank_eval_k_truncation(spark):
    # the relevant doc sits at rank 3; k=2 must not see it
    res = _res(spark, [(0, 1, 1), (0, 2, 2), (0, 3, 3)])
    jd = _jd(spark, [(0, 3, 2)])
    r2 = rank_eval(res, jd, k=2).collect()[0]
    assert r2["n_retrieved"] == 2 and r2["mrr"] == 0.0 and r2["ndcg"] == 0.0
    r3 = rank_eval(res, jd, k=3).collect()[0]
    assert r3["mrr"] == pytest.approx(1 / 3)
    assert r3["recall"] == pytest.approx(1.0)
    # single judged doc: DCG@3 = 3/log2(4), IDCG = 3/log2(2) -> ndcg = 1/2
    assert r3["ndcg"] == pytest.approx(math.log2(2) / math.log2(4), abs=1e-12)


def test_rank_eval_duplicate_judgments_take_max_grade(spark):
    # two rater files grade the same (query, doc): the join must not fan
    # out (ES keeps one rating per doc — max here), metrics stay <= 1
    res = _res(spark, [(0, 1, 10), (0, 2, 11)])
    jd = _jd(spark, [(0, 10, 0), (0, 10, 2), (0, 11, 1), (0, 11, 1)])
    r = rank_eval(res, jd, k=10).collect()[0]
    assert r["n_retrieved"] == 2
    assert r["n_relevant"] == 2
    assert r["precision"] == pytest.approx(1.0)
    assert r["recall"] == pytest.approx(1.0)
    assert 0.0 < r["ndcg"] <= 1.0
