import pandas as pd
from pyspark.sql import functions as F

from igd_spark import oracle
from igd_spark.tokenizer import postings, token_count_col, tokens_col


def test_tokens_match_oracle_spec(spark):
    texts = [
        "Hello, World 42!",
        "a--b  c\td",
        "",
        "   ",
        "ALL CAPS and MixedCase99",
        "unicode café née",  # non-ascii chars are separators
    ]
    df = spark.createDataFrame(pd.DataFrame({"text": texts}))
    got = df.select(
        F.filter(tokens_col("text"), lambda t: t != F.lit("")).alias("toks")
    ).collect()
    for row, text in zip(got, texts):
        assert list(row["toks"]) == oracle.tokenize(text), text


def test_token_count_col(spark):
    df = spark.createDataFrame(pd.DataFrame({"text": ["a b  c", "", "x!y"]}))
    got = [r[0] for r in df.select(token_count_col("text")).collect()]
    assert got == [3, 0, 2]


def test_postings_match_oracle(spark, tiny_docs, tiny_pdf):
    docs = tiny_docs.withColumn(
        "doc_id",
        (F.xxhash64("conv_id") % 100000) * 100 + F.col("turn_idx"),
    )
    pdf = docs.select("doc_id", "text").toPandas()
    oidx = oracle.build_oracle_index(list(zip(pdf["doc_id"], pdf["text"])))
    got = postings(docs).collect()
    got_map = {}
    for r in got:
        got_map.setdefault(r["term"], {})[r["doc_id"]] = r["tf"]
    assert got_map == oidx.postings


def test_phrase_match_semantics(spark):
    """Hand-checkable phrases: consecutive positions only, overlapping
    occurrences counted, repeated-term phrases exact."""
    from igd_spark.search import phrase_match, positional_postings

    docs = spark.createDataFrame(
        [
            (0, "a b a b a"),      # "a b" x2 (overlap chain), "a b a" x2
            (1, "a x b"),          # no "a b" (not consecutive)
            (2, "a b"),            # "a b" x1
            (3, "b a b a"),        # "a b" x1, "a b a" x1
        ],
        "doc_id long, text string",
    )
    ph = spark.createDataFrame(
        [(0, "a b"), (1, "a b a"), (2, "missing term")],
        "query_id long, query_text string",
    )
    got = {(r["query_id"], r["doc_id"]): r["n_hits"] for r in phrase_match(docs, ph).collect()}
    assert got[(0, 0)] == 2 and got[(0, 2)] == 1 and got[(0, 3)] == 1
    assert (0, 1) not in got
    assert got[(1, 0)] == 2 and got[(1, 3)] == 1 and (1, 2) not in got
    assert not any(q == 2 for q, _ in got)
    # positional postings are dense 0-based per doc
    pp = positional_postings(docs)
    rows = sorted((r["pos"], r["term"]) for r in pp.filter("doc_id = 1").collect())
    assert rows == [(0, "a"), (1, "x"), (2, "b")]


def test_analyzer_stopwords_min_len(spark, tiny_docs):
    # analyzer consistency across ALL term engines: JVM postings, Arrow
    # SPIMI kernel, and dl (which must count only indexed tokens)
    import pandas as pd

    from igd_spark import IndexConf
    from igd_spark.corpus import assign_doc_ids
    from igd_spark.stats import doc_stats
    from igd_spark.tokenizer import postings, postings_spimi

    docs = assign_doc_ids(tiny_docs)
    conf = IndexConf(stopwords=("the", "a", "to"), min_token_len=2).validate()
    p = postings(docs, conf=conf).toPandas()
    assert not (set(p["term"]) & {"the", "a", "to"})
    assert p["term"].str.len().min() >= 2
    sp = postings_spimi(docs, conf=conf).toPandas()
    pd.testing.assert_frame_equal(
        p.sort_values(["doc_id", "term"]).reset_index(drop=True),
        sp[["doc_id", "term", "tf"]].sort_values(["doc_id", "term"]).reset_index(drop=True),
    )
    # dl = count of SURVIVING tokens everywhere (Lucene norm convention)
    ds = doc_stats(docs, conf=conf).toPandas().set_index("doc_id")["dl"]
    tfsum = sp.groupby("doc_id")["tf"].sum()
    for d, s in tfsum.items():
        assert int(ds[d]) == int(s)
    # default conf unchanged: stopwords present again
    p0 = postings(docs).toPandas()
    assert len(p0) >= len(p)


def test_analyzer_index_roundtrip(spark, tiny_docs, tmp_path):
    # an analyzer conf survives the index build + reopen, and the indexed
    # scorer stays rank-identical to the exact scorer under it
    import pandas as pd

    from igd_spark import IndexConf, build_index, open_index, search
    from igd_spark.corpus import assign_doc_ids
    from igd_spark.search import exact_bm25_topk

    conf = IndexConf(block_size=32, n_shards=4, stopwords=("the", "a"),
                     min_token_len=2)
    docs = assign_doc_ids(tiny_docs, conf)
    path = str(tmp_path / "swidx")
    build_index(spark, docs, path, conf=conf)
    idx = open_index(spark, path)
    assert tuple(idx.conf.stopwords) == ("the", "a")
    assert idx.conf.min_token_len == 2
    q = spark.createDataFrame(
        [(0, "the user"), (1, "error")], "query_id long, query_text string"
    )
    a = search(spark, idx, q, k=20).toPandas()
    b = exact_bm25_topk(docs, q, k=20, conf=conf).toPandas()
    key = ["query_id", "rank", "doc_id"]
    pd.testing.assert_frame_equal(
        a[key].sort_values(key).reset_index(drop=True),
        b[key].sort_values(key).reset_index(drop=True),
    )


def test_analyzer_validation():
    import pytest as _pytest

    from igd_spark import IndexConf

    with _pytest.raises(ValueError):
        IndexConf(stopwords=("The",)).validate()
    with _pytest.raises(ValueError):
        IndexConf(stopwords=("two words",)).validate()
    with _pytest.raises(ValueError):
        IndexConf(min_token_len=0).validate()


def test_analyzer_conjunctive_stop_filter(spark, tiny_docs):
    # Lucene stop-filter contract: a MUST/AND stopword clause is DROPPED,
    # not unsatisfiable; an all-stopword query matches nothing
    import pandas as pd

    from igd_spark import IndexConf
    from igd_spark.corpus import assign_doc_ids
    from igd_spark.querylang import bool_bm25_topk
    from igd_spark.queryparse import parsed_bm25_topk
    from igd_spark.stats import term_stats
    from igd_spark.tokenizer import postings

    docs = assign_doc_ids(tiny_docs)
    ts = term_stats(postings(docs)).filter(F.col("df").between(5, 50))
    t1 = ts.orderBy("term").first()["term"]
    conf = IndexConf(stopwords=("the", "a"), min_token_len=1).validate()

    def srt(df):
        p = df.toPandas()
        return p.sort_values(list(p.columns)).reset_index(drop=True)

    # bool AND: "the X" under the analyzer == plain "X"
    qa = spark.createDataFrame([(0, f"the {t1}")], "query_id long, query_text string")
    qb = spark.createDataFrame([(0, t1)], "query_id long, query_text string")
    a = srt(bool_bm25_topk(docs, qa, k=50, conf=conf, round_dp=9))
    b = srt(bool_bm25_topk(docs, qb, k=50, conf=conf, round_dp=9))
    assert len(a) > 0
    pd.testing.assert_frame_equal(a, b)
    # parsed: '+the +X' == '+X'; '-the X' bans nothing
    pa = srt(parsed_bm25_topk(docs, [(0, f"+the +{t1}")], k=50, conf=conf, round_dp=9))
    pb = srt(parsed_bm25_topk(docs, [(0, f"+{t1}")], k=50, conf=conf, round_dp=9))
    assert len(pa) > 0
    pd.testing.assert_frame_equal(pa, pb)
    na = srt(parsed_bm25_topk(docs, [(0, f"-the {t1}")], k=50, conf=conf, round_dp=9))
    nb = srt(parsed_bm25_topk(docs, [(0, t1)], k=50, conf=conf, round_dp=9))
    pd.testing.assert_frame_equal(na, nb)
    # all-stopword queries match nothing
    assert bool_bm25_topk(docs, spark.createDataFrame(
        [(0, "the a")], "query_id long, query_text string"), k=10, conf=conf).count() == 0
    assert parsed_bm25_topk(docs, [(0, "+the a")], k=10, conf=conf).count() == 0


def test_analyzer_phrase_stays_literal(spark, tiny_docs):
    # review fix: a phrase of analyzed-away words matches the RAW token
    # stream (literal semantics) — a MUST '"<stop> <stop>"' clause keeps
    # matching the docs that literally contain it, never making the query
    # unsatisfiable, even though its words have no postings
    from igd_spark import IndexConf
    from igd_spark.corpus import assign_doc_ids
    from igd_spark.queryparse import parsed_bm25_topk
    from igd_spark.search import phrase_match

    docs = assign_doc_ids(tiny_docs)
    # find an occurring 2-token phrase and stop BOTH of its words
    import re as _re

    row = docs.select("text").filter(F.length("text") > 20).first()
    toks = [t for t in _re.split(r"[^a-z0-9]+", str(row["text"]).lower()) if t]
    phrase = f"{toks[0]} {toks[1]}"
    conf = IndexConf(stopwords=tuple(sorted({toks[0], toks[1]}))).validate()
    q = spark.createDataFrame([(0, phrase)], "query_id long, query_text string")
    expect = {r["doc_id"] for r in phrase_match(docs, q).collect()}
    out = parsed_bm25_topk(docs, [(0, f'+"{phrase}"')], k=10_000, conf=conf).toPandas()
    assert set(out["doc_id"]) == expect and len(expect) > 0
    # all-stopword phrase clauses score 0 (no surviving constituents)
    assert (out["score"] == 0.0).all()
