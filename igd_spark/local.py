"""Driver-side single-query serving — the in-process ms-scale `search_1`
analog (src_py/igd_py.pyx:31-38, kernel src_py/igd_search.c:25-102).

The batch `search()` operator launches Spark jobs: several hundred ms of
scheduling floor even when the data touched is a handful of blocks. The
reference's single-query call is an in-process function against resident
metadata + a seek into the data file. This module is that path for the
Spark-built index: the index LAYOUT already supports it (shard dirs +
files sorted by term_id with parquet row-group statistics), so a single
query needs no cluster at all —

    cached dictionary lookup (term → term_id, df, n_salts)
      → shards_for() probe set (driver arithmetic)
      → pyarrow row-group-pruned reads of the few matching block rows
      → the same numpy decode + BM25 kernel math as the cluster scorer

No SparkSession is touched. Results are exactly `search()`'s top-k
(same formula, same (score desc, doc_id asc) tie-break; tested
rank-identical). At 100 TB the reads stay small — a term's blocks are
contiguous row-group runs inside its shard's files — while the
dictionary lookup is a predicate-pushdown scan of the (comparatively
tiny) dictionary table, memoized per handle.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from igd_spark import codec
from igd_spark.build import shards_for


def _tokenize_one(text: str, split_re: str) -> list[str]:
    import re

    return sorted({t for t in re.split(split_re, (text or "").lower()) if t})


class LocalSearcher:
    """Per-index driver-side searcher. Holds the memoized dictionary slice
    (the reference keeps the whole dictionary resident, src/igd_base.c:312-321;
    we fault terms in on demand through parquet predicate pushdown)."""

    def __init__(self, idx):
        self.idx = idx
        self.path = idx.path
        self.conf = idx.conf
        self.n_docs = idx.n_docs
        self.avgdl = idx.avgdl
        self.batches = list(idx.batches)
        self._dict_cache: dict[str, tuple[int, int, int] | None] = {}

    # --- table roots (base ∪ committed batch dirs) -------------------------
    def _table_dirs(self, sub: str) -> list[str]:
        dirs = [os.path.join(self.path, sub)]
        for tag in self.batches:
            d = os.path.join(self.path, "batches", tag, sub)
            if os.path.isdir(d):
                dirs.append(d)
        return dirs

    def _lookup_terms(self, terms: list[str]) -> dict[str, tuple[int, int, int]]:
        """term → (term_id, df, n_salts), folded over base + delta rows
        (df additive, n_salts max — same fold as InvertedIndex.dictionary)."""
        import pyarrow.compute as pc
        import pyarrow.dataset as pads

        missing = [t for t in terms if t not in self._dict_cache]
        if missing:
            found: dict[str, list[tuple[int, int, int]]] = {}
            for d in self._table_dirs("dictionary"):
                t = pads.dataset(d).to_table(
                    columns=["term", "term_id", "df", "n_salts"],
                    filter=pc.field("term").isin(missing),
                )
                for term, tid, df, ns in zip(
                    t["term"].to_pylist(), t["term_id"].to_pylist(),
                    t["df"].to_pylist(), t["n_salts"].to_pylist(),
                ):
                    found.setdefault(term, []).append((int(tid), int(df), int(ns)))
            for t in missing:
                rows = found.get(t)
                if not rows:
                    self._dict_cache[t] = None
                else:
                    self._dict_cache[t] = (
                        rows[0][0],
                        sum(r[1] for r in rows),
                        max(r[2] for r in rows),
                    )
        return {t: v for t in terms if (v := self._dict_cache.get(t)) is not None}

    def _read_blocks(self, term_ids: list[int], shards: list[int]) -> pd.DataFrame:
        """Block rows for the given terms, row-group-pruned: only shard
        dirs in the probe set are opened, and within them pyarrow skips
        row groups whose term_id min/max excludes every queried term (the
        files are sorted by term_id — the tile-seek analog,
        src/igd_search.c:459-464)."""
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.dataset as pads

        cols = ["term_id", "salt", "n", "doc_ids", "tfs", "dls"]
        tabs = []
        for root in self._table_dirs("segments"):
            for s in shards:
                d = os.path.join(root, f"shard={s}")
                if not os.path.isdir(d):
                    continue
                tabs.append(
                    pads.dataset(d).to_table(
                        columns=cols, filter=pc.field("term_id").isin(term_ids)
                    )
                )
        if not tabs:
            return pd.DataFrame(columns=cols)
        return pa.concat_tables(tabs).to_pandas()

    def search_one(self, query_text: str, k: int = 10, min_tf: int = 0) -> pd.DataFrame:
        """(rank, doc_id, score) — exact BM25 top-k for one query, no Spark
        jobs. Same math and tie-break as the cluster kernel."""
        conf = self.conf
        terms = _tokenize_one(query_text, conf.token_split_re)
        empty = pd.DataFrame(
            {"rank": pd.Series(dtype="int32"),
             "doc_id": pd.Series(dtype="int64"),
             "score": pd.Series(dtype="float64")}
        )
        if not terms:
            return empty
        tmap = self._lookup_terms(terms)
        if not tmap:
            return empty
        term_ids = sorted({v[0] for v in tmap.values()})
        shards = sorted(
            {s for (tid, _, ns) in tmap.values() for s in shards_for(tid, ns, conf.n_shards)}
        )
        blocks = self._read_blocks(term_ids, shards)
        if not len(blocks):
            return empty
        idf_by_tid = {
            tid: float(np.log1p((self.n_docs - df + 0.5) / (df + 0.5)))
            for (tid, df, _) in tmap.values()
        }
        k1, b, avgdl = conf.k1, conf.b, self.avgdl
        ids_parts, w_parts = [], []
        for tid, g in blocks.groupby("term_id", sort=True):
            idf = idf_by_tid.get(int(tid))
            if idf is None:
                continue
            d = np.concatenate([codec.decode_doc_ids(bytes(x)) for x in g["doc_ids"]])
            tf = np.concatenate([codec.varint_decode(bytes(x)) for x in g["tfs"]]).astype(np.float64)
            dl = np.concatenate([codec.varint_decode(bytes(x)) for x in g["dls"]]).astype(np.float64)
            if min_tf > 0:
                m = tf >= min_tf
                d, tf, dl = d[m], tf[m], dl[m]
            w = tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
            ids_parts.append(d)
            w_parts.append(idf * w)
        if not ids_parts:
            return empty
        ids = np.concatenate(ids_parts)
        ws = np.concatenate(w_parts)
        uids, inv = np.unique(ids, return_inverse=True)
        scores = np.bincount(inv, weights=ws, minlength=uids.size)
        order = np.lexsort((uids, -scores))[:k]
        return pd.DataFrame(
            {
                "rank": np.arange(1, order.size + 1, dtype=np.int32),
                "doc_id": uids[order],
                "score": scores[order],
            }
        )


def local_searcher(idx) -> LocalSearcher:
    """Memoized per-handle LocalSearcher (dictionary cache survives across
    calls, like the reference's open handle)."""
    ls = getattr(idx, "_local_searcher", None)
    if ls is None:
        ls = LocalSearcher(idx)
        idx._local_searcher = ls
    return ls
