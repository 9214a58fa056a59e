"""Exact-substring duplicate-span semantics (Lee et al. 2022 style) against
hand-checkable fixtures: boundary-exact span recovery, within-doc repeats,
canonical-copy survival in removal, clean round-trip for unique docs.
Cross-engine value checks live in scripts/gate_check.py."""

from __future__ import annotations

import pytest

from igd_spark import duplicate_span_stats, duplicate_spans, remove_duplicate_text

L = 4  # window length for the fixtures (min_len tokens)

# token-stream fixtures; tokens are single letters so positions are easy to
# count by eye. Docs 1 and 2 share the 6-token block "c d e f g h" at
# different offsets; doc 3 is unique; doc 4 repeats its own 4-token opening.
DOCS = [
    (1, "a b c d e f g h i j"),          # shared block at positions 3..8
    (2, "x c d e f g h y z w q r"),      # shared block at positions 2..7
    (3, "p q r s aa bb cc dd"),          # unique
    (4, "m n o pp m n o pp ee ff gg hh ii"),  # self-repeat: 1..4 dup of 5..8
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string").cache()


def _spans(df):
    return {
        (r.doc_id, r.span_start, r.span_end, r.span_len)
        for r in df.collect()
    }


def test_cross_doc_span_boundaries_exact(spark, docs):
    got = _spans(duplicate_spans(docs, min_len=L))
    # doc 1: windows starting at 3,4,5 are duplicated -> merged span 3..8
    assert (1, 3, 8, 6) in got
    # doc 2: same content at 2..7
    assert (2, 2, 7, 6) in got
    # doc 3 contributes nothing
    assert not any(d == 3 for d, *_ in got)


def test_within_doc_repeat_detected(spark, docs):
    got = _spans(duplicate_spans(docs, min_len=L))
    # doc 4: "m n o pp" occurs at 1..4 and 5..8 -> adjacent windows merge
    # into one covered span 1..8
    assert (4, 1, 8, 8) in got


def test_stats_cover_all_docs_with_zero_fill(spark, docs):
    rows = {r.doc_id: r for r in duplicate_span_stats(docs, min_len=L).collect()}
    assert set(rows) == {1, 2, 3, 4}
    assert rows[3].dup_tokens == 0 and rows[3].n_spans == 0 and rows[3].dup_ratio == 0.0
    assert rows[1].n_tokens == 10 and rows[1].dup_tokens == 6 and rows[1].n_spans == 1
    assert rows[1].dup_ratio == pytest.approx(0.6)
    assert rows[4].dup_tokens == 8 and rows[4].n_tokens == 13


def test_removal_keeps_canonical_copy(spark, docs):
    rows = {r.doc_id: r for r in remove_duplicate_text(docs, min_len=L).collect()}
    # canonical occurrence of the shared block is in doc 1 (min doc_id):
    # doc 1 round-trips untouched, doc 2 loses exactly the block
    assert rows[1].clean_text == "a b c d e f g h i j"
    assert rows[1].n_removed == 0
    assert rows[2].clean_text == "x y z w q r"
    assert rows[2].n_removed == 6
    # unique doc round-trips
    assert rows[3].clean_text == "p q r s aa bb cc dd"
    assert rows[3].n_removed == 0


def test_removal_keeps_first_within_doc_occurrence(spark, docs):
    rows = {r.doc_id: r for r in remove_duplicate_text(docs, min_len=L).collect()}
    # doc 4: canonical (first) "m n o pp" survives, the second copy is removed
    assert rows[4].clean_text == "m n o pp ee ff gg hh ii"
    assert rows[4].n_removed == 4


def test_corpus_wide_token_conservation(spark, docs):
    stats = {r.doc_id: r for r in duplicate_span_stats(docs, min_len=L).collect()}
    rem = {r.doc_id: r for r in remove_duplicate_text(docs, min_len=L).collect()}
    for d in (1, 2, 3, 4):
        # removal strips a subset of the covered positions (non-canonical
        # occurrences only), never more than the duplicated coverage
        assert 0 <= rem[d].n_removed <= stats[d].dup_tokens
        kept = len([t for t in rem[d].clean_text.split() if t])
        assert kept + rem[d].n_removed == stats[d].n_tokens


def test_min_len_validation(spark, docs):
    with pytest.raises(ValueError):
        duplicate_spans(docs, min_len=1)
    with pytest.raises(ValueError):
        remove_duplicate_text(docs, min_len=0)
