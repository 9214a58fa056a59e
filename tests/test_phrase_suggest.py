"""phrase_suggest — ES phrase-suggester semantics: SymSpell candidate
generation re-ranked by corpus bigram support, confidence-gated real-word
correction. Reference surface: the suggester rides the same dictionary the
index builds (src/igd_base.c:122-145 interning); ranking is original."""

from __future__ import annotations

import pytest

from igd_spark import phrase_suggest, postings
from igd_spark.stats import term_stats


@pytest.fixture(scope="module")
def corpus(spark):
    docs = spark.createDataFrame(
        [
            (1, "deploy timeout failed again"),
            (2, "deploy timeout failed again"),
            (3, "the team met for standup"),
            (4, "team meeting notes"),
            (5, "tea is hot"),
        ],
        "doc_id long, text string",
    )
    return docs, term_stats(postings(docs))


def _run(spark, corpus, qs, **kw):
    docs, ts = corpus
    q = spark.createDataFrame(qs, "query_id long, query_text string")
    return {
        r.query_id: (r.suggestion, r.n_changed)
        for r in phrase_suggest(q, docs, ts, **kw).collect()
    }


def test_oov_correction_uses_bigram_context(spark, corpus):
    out = _run(spark, corpus, [(0, "deploy timout")])
    assert out[0] == ("deploy timeout", 1)


def test_real_word_correction_needs_strictly_more_support(spark, corpus):
    out = _run(
        spark,
        corpus,
        [
            (1, "the tea met"),  # c(the,team)+c(team,met)=2 > 0 for tea -> corrected
            (2, "tea is hot"),  # tea's own bigrams support it -> kept
        ],
    )
    assert out[1] == ("the team met", 1)
    assert out[2] == ("tea is hot", 0)


def test_no_candidate_and_singleton_pass_through(spark, corpus):
    out = _run(spark, corpus, [(3, "zzz flub"), (4, "tea")])
    assert out[3] == ("zzz flub", 0)  # nothing within 1 edit
    # singleton: no bigram context, in-vocab token keeps itself (boost 1.0)
    assert out[4] == ("tea", 0)


def test_zero_token_query_yields_no_row_and_punct_is_analyzed_away(spark, corpus):
    out = _run(spark, corpus, [(5, "!!!"), (6, "  DEPLOY, timout!")])
    assert 5 not in out
    assert out[6] == ("deploy timeout", 1)


def test_matches_did_you_mean_when_context_is_silent(spark, corpus):
    # an OOV singleton degrades to similarity-then-popularity order
    from igd_spark import did_you_mean

    docs, ts = corpus
    q = spark.createDataFrame([(7, "standap")], "query_id long, query_text string")
    ps = phrase_suggest(q, docs, ts).collect()[0]
    dym = did_you_mean(q, ts).collect()[0]
    assert ps.suggestion == dym.suggestion == "standup"
