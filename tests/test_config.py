"""IndexConf validation + the r4 knob promotion (search-routing thresholds
live on the conf, env override optional)."""

from __future__ import annotations

import pytest

from igd_spark import IndexConf


def test_default_conf_validates():
    IndexConf().validate()


@pytest.mark.parametrize(
    "pat",
    [
        r"(?=[a-z])x",      # lookahead
        r"(?<!a)b",         # lookbehind
        r"(a)\1",           # backreference
        r"\p{L}+",          # unicode property class
        r"[unclosed",       # plain invalid
    ],
)
def test_divergent_split_re_rejected(pat):
    """Arrow RE2 (build kernel) and Java regex (query/stats columns) must
    tokenize identically; patterns outside the shared subset fail loudly at
    conf time instead of silently desyncing dl from tf (r4 ADVICE)."""
    with pytest.raises(ValueError, match="token_split_re"):
        IndexConf(token_split_re=pat).validate()


def test_re2_safe_patterns_accepted():
    for pat in (r"[^a-z0-9]+", r"\s+", r"[\W_]+"):
        IndexConf(token_split_re=pat).validate()


def test_search_knobs_are_conf_fields():
    c = IndexConf(
        search_small_max_rows=7,
        search_prune_max_terms=3,
        driver_search_max_queries=5,
        driver_search_max_postings=11,
    )
    assert (c.search_small_max_rows, c.search_prune_max_terms) == (7, 3)
    assert (c.driver_search_max_queries, c.driver_search_max_postings) == (5, 11)
    # round-trips through the persisted meta dict (asdict → IndexConf(**d))
    from dataclasses import asdict

    assert IndexConf(**asdict(c)) == c
