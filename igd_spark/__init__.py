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

from igd_spark.aggs import (
    cardinality_agg,
    histogram_agg,
    significant_terms,
    stats_agg,
    top_hits_agg,
)
from igd_spark.config import IndexConf
from igd_spark.cooccur import source_overlap_matrix, term_cooccurrence, write_hitsmap_csv
from igd_spark.corpus import (
    assign_doc_ids,
    create_from_files,
    read_transcripts,
    synth_transcripts,
)
from igd_spark.dedup import (
    connected_components,
    dedup_clusters,
    exact_dedup,
    fuzzy_dedup_docs,
    minhash_dedup_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    shingles,
    simhash_dedup_pairs,
)
from igd_spark.index import (
    InvertedIndex,
    append_index,
    build_index,
    compact_index,
    delete_by_query,
    delete_docs,
    maintain_index,
    open_index,
    purge_staging,
)
from igd_spark.events import sessionize
from igd_spark.multimodal import extract_features, extract_features_long, media_stats
from igd_spark.pipeline import curate, curated_docs
from igd_spark.querylang import (
    bool_bm25_topk,
    bool_bm25_topk_indexed,
    boosted_bm25_topk,
    boosted_bm25_topk_indexed,
    conv_bm25_topk,
    explain_scores,
    facet_counts,
    facet_counts_indexed,
    filtered_bm25_topk,
    filtered_bm25_topk_indexed,
    fuzzy_bm25_topk,
    fuzzy_bm25_topk_indexed,
    fuzzy_expand,
    group_bm25_topk,
    group_bm25_topk_indexed,
    lm_dirichlet_topk,
    lm_dirichlet_topk_indexed,
    more_like_this,
    near_match,
    near_match_indexed,
    prefix_bm25_topk,
    prefix_bm25_topk_indexed,
    rescore_topk,
    rrf_fuse,
    search_after_topk,
    snippets,
    snippets_indexed,
    suggest_terms,
    synonym_bm25_topk,
    synonym_bm25_topk_indexed,
    wildcard_bm25_topk,
    wildcard_bm25_topk_indexed,
)
from igd_spark.queryparse import (
    Clause,
    parse_query,
    parsed_bm25_topk,
    parsed_bm25_topk_indexed,
    parsed_matches,
    percolate,
)
from igd_spark.search import (
    bm25_scores,
    exact_bm25_topk,
    match_enumerate,
    phrase_match,
    phrase_match_indexed,
    positional_enumerate,
    positional_postings,
    search,
    search_one,
    source_hits,
)
from igd_spark.seqpare import query_doc_jaccard, seqpare_scores
from igd_spark.similarity import (
    cosine_neardup_banded,
    cosine_neardup_pairs,
    cosine_topk,
    cosine_topk_arrow,
    ivf_ann_topk,
    lsh_ann_topk,
    pick_anchors,
)
from igd_spark.stats import corpus_stats, doc_stats, term_stats, term_vectors
from igd_spark.textstats import fingerprint, keywords_topk, lang_id, simhash, text_stats
from igd_spark.trainprep import (
    decontaminate,
    pack_sequences,
    remove_boilerplate,
    repetition_stats,
    sample_stratified,
    span_df,
)
from igd_spark.tokenizer import postings, tokens_col

__all__ = [
    "Clause",
    "IndexConf",
    "InvertedIndex",
    "append_index",
    "assign_doc_ids",
    "bm25_scores",
    "bool_bm25_topk",
    "bool_bm25_topk_indexed",
    "boosted_bm25_topk",
    "boosted_bm25_topk_indexed",
    "build_index",
    "compact_index",
    "connected_components",
    "conv_bm25_topk",
    "corpus_stats",
    "cosine_neardup_banded",
    "cosine_neardup_pairs",
    "cosine_topk",
    "cosine_topk_arrow",
    "create_from_files",
    "curate",
    "curated_docs",
    "decontaminate",
    "dedup_clusters",
    "delete_by_query",
    "delete_docs",
    "doc_stats",
    "exact_bm25_topk",
    "exact_dedup",
    "explain_scores",
    "extract_features",
    "extract_features_long",
    "facet_counts",
    "facet_counts_indexed",
    "cardinality_agg",
    "histogram_agg",
    "significant_terms",
    "stats_agg",
    "top_hits_agg",
    "fuzzy_bm25_topk",
    "fuzzy_bm25_topk_indexed",
    "fuzzy_dedup_docs",
    "fuzzy_expand",
    "filtered_bm25_topk",
    "filtered_bm25_topk_indexed",
    "fingerprint",
    "group_bm25_topk",
    "group_bm25_topk_indexed",
    "ivf_ann_topk",
    "keywords_topk",
    "lang_id",
    "lm_dirichlet_topk",
    "lm_dirichlet_topk_indexed",
    "lsh_ann_topk",
    "maintain_index",
    "match_enumerate",
    "near_match",
    "near_match_indexed",
    "media_stats",
    "minhash_dedup_pairs",
    "minhash_signatures",
    "more_like_this",
    "ngram_jaccard_pairs",
    "open_index",
    "pack_sequences",
    "parse_query",
    "parsed_bm25_topk",
    "parsed_bm25_topk_indexed",
    "parsed_matches",
    "percolate",
    "phrase_match",
    "phrase_match_indexed",
    "pick_anchors",
    "prefix_bm25_topk",
    "prefix_bm25_topk_indexed",
    "purge_staging",
    "positional_enumerate",
    "positional_postings",
    "postings",
    "query_doc_jaccard",
    "read_transcripts",
    "remove_boilerplate",
    "repetition_stats",
    "rescore_topk",
    "rrf_fuse",
    "search_after_topk",
    "sample_stratified",
    "search",
    "search_one",
    "seqpare_scores",
    "sessionize",
    "shingles",
    "simhash",
    "simhash_dedup_pairs",
    "snippets",
    "snippets_indexed",
    "source_hits",
    "source_overlap_matrix",
    "span_df",
    "suggest_terms",
    "synonym_bm25_topk",
    "synonym_bm25_topk_indexed",
    "synth_transcripts",
    "term_cooccurrence",
    "term_stats",
    "term_vectors",
    "text_stats",
    "tokens_col",
    "wildcard_bm25_topk",
    "wildcard_bm25_topk_indexed",
    "write_hitsmap_csv",
]
