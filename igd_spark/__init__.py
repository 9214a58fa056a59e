"""igd_spark — a PySpark-native inverted-index build + BM25 top-k query engine.

Structural re-expression (NOT a port) of the reference engine databio/IGD
(/root/reference): a tiled/binned, sorted, offset-addressable index built by
batched spill-and-merge and queried by partition pruning + in-block binary
search + counting aggregation (see SURVEY.md for the full operator mapping,
every module here cites the reference file:line it mirrors).

Target data model (BASELINE.json input_hint): Iceberg/Parquet tables of
multi-turn agent transcripts (conv_id, turn_idx, role, text, tool, ts);
one document = one turn under stable (conv_id, turn_idx) ordering.

Public API (analog of the reference's library surface,
src_py/igd_py.pyx:21-44 create/open/search_1/search_n):

    from igd_spark import IndexConf, build_index, open_index, search

    conf  = IndexConf(n_shards=32, block_size=128)
    idx   = build_index(spark, docs_df, path, conf)     # igd create
    idx   = open_index(spark, path)                     # igd_py.open
    top10 = search(spark, idx, queries_df, k=10)        # igd search -q
"""

from igd_spark.config import IndexConf
from igd_spark.corpus import assign_doc_ids, synth_transcripts
from igd_spark.index import InvertedIndex, build_index, open_index
from igd_spark.search import exact_bm25_topk, match_enumerate, search
from igd_spark.stats import corpus_stats, doc_stats, term_stats
from igd_spark.tokenizer import postings, tokens_col

__all__ = [
    "IndexConf",
    "InvertedIndex",
    "assign_doc_ids",
    "build_index",
    "corpus_stats",
    "doc_stats",
    "exact_bm25_topk",
    "match_enumerate",
    "open_index",
    "postings",
    "search",
    "synth_transcripts",
    "term_stats",
    "tokens_col",
]
