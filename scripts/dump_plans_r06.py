"""Dump explain('formatted') plans for the r06-touched queries.

Usage: python scripts/dump_plans_r06.py <outdir> <suffix>

Run from the repo root of the tree whose plans you want (the r5 baseline
tree via a git worktree for *_before.txt, the current tree for
*_after.txt). Materializing persists/counts inside the operators are
stubbed to no-ops so the dumped plan is the FULL lazy pipeline, not an
InMemoryTableScan over a cache.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.getcwd())

OUTDIR = sys.argv[1]
SUFFIX = sys.argv[2]
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

os.makedirs(OUTDIR, exist_ok=True)

from pyspark.sql import DataFrame  # noqa: E402

# stub materialization so entries stay lazy (plans only, no cache scans)
DataFrame.persist = lambda self, *a, **k: self
DataFrame.unpersist = lambda self, *a, **k: self
_orig_count = DataFrame.count
DataFrame.count = lambda self: 0

from igd_spark.session import get_spark  # noqa: E402

spark = get_spark(cores=8, app="plan_dump", shuffle_partitions=8)


def dump(name: str, df: DataFrame) -> None:
    txt = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    p = os.path.join(OUTDIR, f"{name}_{SUFFIX}.txt")
    with open(p, "w") as f:
        f.write(txt)
    print("wrote", p, flush=True)


import __spark_entry__ as em  # noqa: E402

docs = em._docs(spark, SF_DIR)
queries = em._queries_df(spark)

# --- dedup family -----------------------------------------------------------
from igd_spark import (  # noqa: E402
    dsir_weights,
    duplicate_spans,
    minhash_dedup_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    phrase_match,
)

dump("dedup_minhash_lsh", minhash_dedup_pairs(
    docs, threshold=em.EST_JACCARD_TH, n_hashes=em.N_HASHES,
    band_rows=em.BAND_ROWS, n=em.SHINGLE_N))
dump("minhash_signatures", minhash_signatures(
    docs, n_hashes=em.N_HASHES, n=em.SHINGLE_N))
dump("dedup_ngram_jaccard", ngram_jaccard_pairs(
    docs, threshold=em.JACCARD_TH, n=em.SHINGLE_N,
    max_shingle_df=em.MAX_SHINGLE_DF))
dump("duplicate_spans", duplicate_spans(docs, min_len=em.DUP_SPAN_LEN))
dump("dsir_weights", dsir_weights(
    docs, em.DSIR_TARGET, n_buckets=em.DSIR_BUCKETS, alpha=em.DSIR_ALPHA,
    round_dp=6))
dump("phrase_match", phrase_match(docs, em._phrases_df(spark)))

# --- frequent_item_sets (collect for max_l runs a real job; persists are
# stubbed so the plan below it is fully lazy) --------------------------------
from igd_spark import frequent_item_sets_agg  # noqa: E402

try:
    dump("frequent_item_sets_agg", frequent_item_sets_agg(
        docs, queries, min_support=em.FIS_MIN_SUPPORT, k=em.FIS_K,
        max_support_frac=em.FIS_MAX_SUPPORT_FRAC,
        min_support_frac=em.FIS_MIN_SUPPORT_FRAC))
except Exception as e:  # r5 tree has no max_l collect; both shapes dump fine
    print("fis dump failed:", e)

# --- index build segment plan ----------------------------------------------
from pyspark.sql import functions as F  # noqa: E402

from igd_spark import IndexConf  # noqa: E402
from igd_spark.build import build_segments, hot_terms, salted_postings  # noqa: E402
from igd_spark.tokenizer import postings_spimi  # noqa: E402

conf = IndexConf(block_size=128, n_shards=32, salt_df_threshold=65_536)
post = postings_spimi(docs.withColumn("doc_id", F.col("doc_id")), conf=conf)
hot = spark.createDataFrame([], "term string, n_salts int")
dump("index_build_segments", build_segments(salted_postings(post, hot, conf), conf, 43.0))

# --- spark-small search plan (the 1000q engine) -----------------------------
from igd_spark import build_index, search  # noqa: E402
import tempfile  # noqa: E402

DataFrame.count = _orig_count  # the index build needs real actions
idx_path = tempfile.mkdtemp(prefix="plan_dump_idx_") + "/idx"
idx = build_index(spark, docs, idx_path, conf=conf)
dump("bm25_search_spark_small", search(spark, idx, queries, k=10, engine="spark"))
print("done")
