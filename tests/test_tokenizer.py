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
