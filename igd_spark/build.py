"""Segment build — the `igd create` analog (src/igd_create.c:25-121).

Pipeline (SURVEY §3.1 mapping):
  docs → postings (tokenize+count, JVM built-ins)            [ingest, B1]
       → join doc lengths (dl denormalized into postings,
         like gdata_t.value rides in every record,
         src/igd_base.h:45)                                  [stats, B7]
       → salt hot terms (replaces interval duplication +
         first-tile dedup, src/igd_base.c:162-172)           [B4/skew]
       → groupBy(term, salt).applyInPandas(pack)             [spill+merge,
         B5/B6: Spark's shuffle IS igd_saveT's run spill;
         the in-kernel np.sort IS the radix-sort finalize,
         src/igd_base.c:424-459]
       → block rows (delta+varint doc gaps, varint tfs,
         per-block score upper bound)                        [S7 sink]

Block-max metadata: each block stores ``ub_tf_dl`` = max over its postings of
tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl)). The query-time block max score is
idf(term) * ub_tf_dl — computable without knowing df at pack time, so the
build needs NO term-stats join in the hot path. This is the block-max WAND
seed the reference's running-max-end ``maxE`` early-exit prefigures
(src/igd_search.c:790-812).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from igd_spark import codec
from igd_spark.config import DEFAULT_CONF, IndexConf
from igd_spark.stats import corpus_stats, doc_stats, term_stats
from igd_spark.tokenizer import postings

BLOCK_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("salt", T.IntegerType(), False),
        T.StructField("block_id", T.IntegerType(), False),
        T.StructField("n", T.IntegerType(), False),
        T.StructField("first_doc", T.LongType(), False),
        T.StructField("last_doc", T.LongType(), False),
        T.StructField("doc_ids", T.BinaryType(), False),
        T.StructField("tfs", T.BinaryType(), False),
        # per-posting doc lengths ride inside the block (the gdata_t.value
        # field analog, src/igd_base.h:45) so the scorer never joins the
        # billion-row doc_stats table at query time
        T.StructField("dls", T.BinaryType(), False),
        T.StructField("max_tf", T.IntegerType(), False),
        T.StructField("ub_tf_dl", T.DoubleType(), False),
    ]
)


def salted_postings(
    post_dl: DataFrame, tstats: DataFrame, conf: IndexConf
) -> DataFrame:
    """Add ``salt`` to postings: hot terms (df > salt_df_threshold) are split
    into ceil(df/threshold) sub-lists by doc_id modulus; cold terms get
    salt 0. Hot-term table is tiny (Zipf head) → broadcast join; the
    subsequent groupBy(term, salt) is therefore bounded per group — the
    memory-bound SPIMI batch, maxCount analog (src/igd_base.h:37)."""
    hot = (
        tstats.filter(F.col("df") > conf.salt_df_threshold)
        .select(
            "term",
            F.least(
                F.ceil(F.col("df") / conf.salt_df_threshold).cast("int"),
                F.lit(conf.max_salts),
            ).alias("n_salts"),
        )
    )
    out = post_dl.join(F.broadcast(hot), "term", "left")
    return out.withColumn(
        "salt",
        F.when(
            F.col("n_salts").isNotNull(),
            F.pmod(F.col("doc_id"), F.col("n_salts").cast("long")).cast("int"),
        ).otherwise(F.lit(0)),
    ).drop("n_salts")


def _pack_kernel(conf: IndexConf, avgdl: float):
    k1, b, bs = conf.k1, conf.b, conf.block_size

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        term = pdf["term"].iat[0]
        salt = int(pdf["salt"].iat[0])
        order = np.argsort(pdf["doc_id"].to_numpy(), kind="stable")
        doc_ids = pdf["doc_id"].to_numpy()[order].astype(np.int64)
        tfs = pdf["tf"].to_numpy()[order].astype(np.int64)
        dls = pdf["dl"].to_numpy()[order].astype(np.int64)
        w = tfs * (k1 + 1.0) / (
            tfs + k1 * (1.0 - b + b * dls.astype(np.float64) / avgdl)
        )
        rows = []
        for bi, lo in enumerate(range(0, len(doc_ids), bs)):
            hi = min(lo + bs, len(doc_ids))
            d, t, dl = doc_ids[lo:hi], tfs[lo:hi], dls[lo:hi]
            rows.append(
                (
                    term,
                    salt,
                    bi,
                    int(hi - lo),
                    int(d[0]),
                    int(d[-1]),
                    codec.encode_doc_ids(d),
                    codec.encode_tfs(t),
                    codec.encode_tfs(dl),
                    int(t.max()),
                    float(w[lo:hi].max()),
                )
            )
        return pd.DataFrame(rows, columns=[f.name for f in BLOCK_SCHEMA.fields])

    return pack


def build_segments(
    post_dl_salted: DataFrame, conf: IndexConf, avgdl: float
) -> DataFrame:
    """(term, salt, block rows) → segment DataFrame with shard + term_id.

    shard = pmod(xxhash64(term), n_shards): the physical partition key
    (contig analog, SURVEY §1.4). Salted sub-lists of one term share its
    shard so a term's blocks stay partition-local; skew inside a shard is
    bounded by salting + AQE.
    """
    packed = post_dl_salted.groupBy("term", "salt").applyInPandas(
        _pack_kernel(conf, avgdl), schema=BLOCK_SCHEMA
    )
    return packed.withColumn("term_id", F.xxhash64("term")).withColumn(
        "shard", F.pmod(F.col("term_id"), F.lit(conf.n_shards)).cast("int")
    )


def build_all(
    docs: DataFrame,
    conf: IndexConf = DEFAULT_CONF,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> dict[str, DataFrame | dict]:
    """Compute every index component as DataFrames + collected corpus stats.
    index.build_index() persists them with lineage/resume.

    postings and doc_stats are .persist()ed: three downstream consumers
    (stats sink, dictionary, segments) would otherwise re-run the tokenize +
    (doc,term) shuffle once each — the reference pays this cost once too (its
    ingest loop writes spill runs that the merge re-reads, src/igd_create.c:
    50-88). Caller unpersists via the returned handles."""
    conf.validate()
    post = postings(docs, text_col=text_col, id_col=id_col, conf=conf).persist()
    ds = doc_stats(docs, text_col=text_col, id_col=id_col, conf=conf).persist()
    cs_row = corpus_stats(ds).collect()[0]
    n_docs, avgdl = int(cs_row["n_docs"]), float(cs_row["avgdl"])
    ts = term_stats(post)
    dictionary = ts.select(
        "term",
        F.xxhash64("term").alias("term_id"),
        "df",
        F.when(
            F.col("df") > conf.salt_df_threshold,
            F.least(
                F.ceil(F.col("df") / conf.salt_df_threshold).cast("int"),
                F.lit(conf.max_salts),
            ),
        )
        .otherwise(F.lit(1))
        .alias("n_salts"),
    )
    post_dl = post.join(ds, "doc_id")  # denormalize dl into each posting
    salted = salted_postings(post_dl, ts, conf)
    segments = build_segments(salted, conf, avgdl)
    return {
        "segments": segments,
        "dictionary": dictionary,
        "doc_stats": ds,
        "corpus": {"n_docs": n_docs, "avgdl": avgdl},
        "_cached": [post, ds],
    }
