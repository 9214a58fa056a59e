"""Persistent index: save/open/introspect — the `.igd` file + `_index.tsv`
sidecar analog (src/igd_base.c:396-461, src/igd_create.c:90-111).

On-disk layout (Parquet; in production these are Iceberg tables — the layout
below is a self-describing stand-in since the sandbox has no Iceberg runtime;
every table maps 1:1 to an Iceberg table with the same partition spec):

    <path>/_meta.json      header: conf, corpus stats, schema version
                           (the 12-byte nbp/gType/nCtg header analog,
                           src/igd_base.c:408-410)
    <path>/segments/       block rows, partitioned by shard, sorted within
                           files by (term_id, salt, block_id)
                           (the tile-block data section, src/igd_base.c:426-459)
    <path>/dictionary/     (term, term_id, df, n_salts)
                           (contig-name dict analog, src/igd_base.c:312-321)
    <path>/doc_stats/      (doc_id, dl) (+ docmap columns when present)
                           (_index.tsv analog)
    <path>/positions/      store_positions=True builds only: positional
                           block rows, partitioned by shard like segments/
                           (the gType coordinate-axis layout,
                           src/igd_base.c:408-409); phrase_match_indexed
                           scans it with the same shard/term pruning
    <path>/_lineage/       per-stage + per-shard lineage & metrics JSON rows
                           — the (i0,L0) resume cursor analog
                           (src/igd_create.c:73-88); build resumes from the
                           last committed stage.
    <path>/batches/<tag>/  one committed append batch: its own segments/,
                           doc_stats/, dictionary/ delta (+ positions/ on
                           positional indexes) plus delta.json
                           (corpus-stats delta). Committed by a SINGLE
                           atomic directory rename from _staging/<tag> —
                           the miniature of an Iceberg snapshot commit.
                           Readers serve base ∪ committed batches; the
                           batch dir itself is the idempotency marker, so
                           there is no marker-after-data window at all.
                           compact_index folds batches back into the base.
    <path>/_staging/       in-flight append batches; invisible to readers.
                           A crashed append leaves only junk here — the
                           live index is untouched.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from igd_spark.build import build_all
from igd_spark.config import DEFAULT_CONF, IndexConf
from igd_spark.corpus import assign_doc_ids

SCHEMA_VERSION = 2  # v2: blocks carry (min_dl, b_avgdl) for append-safe bounds
_STAGES = ("doc_stats", "dictionary", "segments")


def _lineage_path(path: str, stage: str) -> str:
    return os.path.join(path, "_lineage", f"{stage}.json")


def _write_lineage(path: str, stage: str, payload: dict) -> None:
    os.makedirs(os.path.join(path, "_lineage"), exist_ok=True)
    payload = {"stage": stage, "committed_at": time.time(), **payload}
    with open(_lineage_path(path, stage), "w") as f:
        json.dump(payload, f, indent=1)


def _stage_done(path: str, stage: str) -> bool:
    return os.path.exists(_lineage_path(path, stage))


_INPROGRESS = "_inprogress"


def _begin_mutation(path: str, op: str, tag: str) -> None:
    """Write the in-progress marker BEFORE the first mutating write, so a
    crash mid-append/compact is detectable (open_index refuses a dirty
    index instead of silently serving half-merged tables)."""
    if os.path.exists(_lineage_path(path, _INPROGRESS)):
        raise RuntimeError(
            f"index at {path} has an unfinished mutation "
            f"({_lineage_path(path, _INPROGRESS)}); repair or rebuild before mutating"
        )
    _write_lineage(path, _INPROGRESS, {"op": op, "tag": tag})


def _end_mutation(path: str) -> None:
    os.remove(_lineage_path(path, _INPROGRESS))


def _swap_dir(final: str, tmp: str) -> None:
    """Two-step rename swap: final → final_old, tmp → final, delete
    final_old. A crash between the renames leaves either the old or the new
    table present under a recoverable name — never a window with NO table
    (the rmtree-then-rename it replaces had exactly that window). The
    Iceberg-commit stand-in for this sandbox's plain-parquet layout."""
    old = final + "_old"
    if os.path.isdir(old):
        import shutil

        shutil.rmtree(old)
    os.rename(final, old)
    os.rename(tmp, final)
    import shutil

    shutil.rmtree(old)


def _batches_root(path: str) -> str:
    return os.path.join(path, "batches")


def _tombstones_root(path: str) -> str:
    return os.path.join(path, "tombstones")


def _list_tombstones(path: str) -> list[str]:
    root = _tombstones_root(path)
    if not os.path.isdir(root):
        return []
    return sorted(
        d
        for d in os.listdir(root)
        if not d.startswith("_") and os.path.isdir(os.path.join(root, d))
    )


def _list_batches(path: str) -> list[str]:
    root = _batches_root(path)
    if not os.path.isdir(root):
        return []
    return sorted(
        d
        for d in os.listdir(root)
        if not d.startswith("_") and os.path.isdir(os.path.join(root, d))
    )


class InvertedIndex:
    """Opened index handle — the iGD_t search-side struct analog: metadata in
    RAM, data blocks streamed from storage (src/igd_base.h:96-105).

    A handle is a SNAPSHOT: it serves the base tables plus the append
    batches committed at open time. Base tables are immutable between
    compactions and batch dirs are never rewritten, so concurrent appends
    never corrupt an open handle — they only become visible to handles
    opened later (snapshot isolation, the Iceberg reader contract this
    layout stands in for)."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        meta: dict,
        batches: list[str] | None = None,
        tombstones: list[str] | None = None,
    ):
        self.spark = spark
        self.path = path
        self.meta = meta
        _c = dict(meta["conf"])
        # JSON round-trips tuples as lists; keep the dataclass canonical
        _c["stopwords"] = tuple(_c.get("stopwords", ()))
        self.conf = IndexConf(**_c)
        self.n_docs: int = meta["corpus"]["n_docs"]
        self.avgdl: float = meta["corpus"]["avgdl"]
        self.batches: list[str] = list(batches) if batches is not None else []
        self.tombstone_tags: list[str] = (
            list(tombstones) if tombstones is not None else []
        )
        self._segments: DataFrame | None = None
        self._dictionary: DataFrame | None = None
        self._tombstones: DataFrame | None = None
        self._tombstones_np = None

    def _read_table(self, path: str, sub: str) -> DataFrame:
        # a legal boundary, not corruption: an EMPTY generation (the
        # rollover target before its first append) has zero block rows,
        # and a zero-row partitionBy write emits a committed dir with no
        # data files — nothing for schema inference to read.  Serve the
        # typed empty table; every downstream plan handles 0 blocks.
        # (A MISSING dir is still an error: these tables are committed by
        # the build's lineage protocol, absent ⇒ broken index.)
        from igd_spark.build import BLOCK_SCHEMA, POS_BLOCK_SCHEMA

        # both schemas already carry `shard` (partitionBy lifts it into the
        # directory layout on write; read restores it)
        schemas = {"segments": BLOCK_SCHEMA, "positions": POS_BLOCK_SCHEMA}
        if sub in schemas and os.path.isdir(path) and not any(
            f.endswith(".parquet")
            for _r, _d, fs in os.walk(path) for f in fs
        ):
            return self.spark.createDataFrame([], schemas[sub])
        return self.spark.read.parquet(path)

    def _union_read(self, sub: str) -> DataFrame:
        """base/<sub> ∪ batches/<tag>/<sub> for every committed batch —
        each branch is its own parquet scan, so shard partition pruning and
        row-group min/max pushdown apply per branch (Catalyst pushes
        filters through Union)."""
        out = self._read_table(os.path.join(self.path, sub), sub)
        for tag in self.batches:
            out = out.unionByName(
                self._read_table(
                    os.path.join(_batches_root(self.path), tag, sub), sub
                )
            )
        return out

    # --- tables (DataFrame handles cached per index — the reference keeps
    # the header/dictionary metadata resident for the handle's lifetime,
    # src_py/igd_base.h:70-84; repeated searches must not re-resolve footers
    # or re-scan the dictionary) --------------------------------------------
    @property
    def segments(self) -> DataFrame:
        if self._segments is None:
            self._segments = self._union_read("segments")
        return self._segments

    @property
    def dictionary(self) -> DataFrame:
        """(term, term_id, df, n_salts) — logical dictionary view over the
        base rows + any append-batch deltas. Appends ship DELTA rows (term,
        df_delta, n_salts) instead of rewriting the whole table (a per-
        micro-batch O(vocab) shuffle at stream rates); the reader folds
        them: df = Σ df, n_salts = max. Cached per handle; compact_index
        consolidates the deltas physically."""
        if self._dictionary is None:
            raw = self._union_read("dictionary")
            self._dictionary = (
                raw.groupBy("term")
                .agg(F.sum("df").alias("df"), F.max("n_salts").alias("n_salts"))
                .select("term", F.xxhash64("term").alias("term_id"), "df", "n_salts")
                .persist()
            )
        return self._dictionary

    @property
    def doc_stats(self) -> DataFrame:
        return self._union_read("doc_stats")

    @property
    def tombstones(self) -> DataFrame | None:
        """(doc_id) of every delete batch committed at open time — the
        Lucene live-docs bitset analog, served as a table.  ``None`` when
        the handle has no deletes (the overwhelmingly common case pays
        nothing).  Like batches, the tag list is this handle's SNAPSHOT:
        deletes committed after open stay invisible to it."""
        if not self.tombstone_tags:
            return None
        if self._tombstones is None:
            out = None
            for tag in self.tombstone_tags:
                d = self.spark.read.parquet(
                    os.path.join(_tombstones_root(self.path), tag)
                )
                out = d if out is None else out.unionByName(d)
            self._tombstones = out.select("doc_id").distinct()
        return self._tombstones

    def live_docs(self, df: DataFrame, col: str = "doc_id") -> DataFrame:
        """Drop tombstoned docs from a (…, doc_id, …) frame — a broadcast
        anti-join, the DataFrame-side live-docs filter every decoded-
        postings path applies.  No-op (same plan) without deletes."""
        ts = self.tombstones
        if ts is None:
            return df
        return df.join(
            F.broadcast(ts.withColumnRenamed("doc_id", col)), col, "left_anti"
        )

    def tombstones_array(self):
        """Sorted int64 numpy array of deleted doc ids (None without
        deletes) — the kernel-side live-docs filter for the MaxScore and
        driver kernels.  Read via pyarrow (no Spark job) and cached per
        handle.  Between compactions a tombstone set is expected to stay a
        small fraction of the corpus (the Lucene deleted-docs guidance —
        expunge via compact_index when it grows); at ~8 B/doc the broadcast
        cost is explicit and linear, and compact_index removes it."""
        if not self.tombstone_tags:
            return None
        if self._tombstones_np is None:
            import numpy as np
            import pyarrow.dataset as pads

            arrs = [
                pads.dataset(
                    os.path.join(_tombstones_root(self.path), tag), format="parquet"
                )
                .to_table(columns=["doc_id"])["doc_id"]
                .to_numpy(zero_copy_only=False)
                for tag in self.tombstone_tags
            ]
            self._tombstones_np = np.unique(
                np.concatenate(arrs).astype(np.int64)
            )
        return self._tombstones_np

    @property
    def positions(self) -> DataFrame:
        """Positional block table (store_positions=True indexes only) —
        the persisted coordinate axis phrase_match_indexed scans instead of
        re-tokenizing the raw corpus (src/igd_base.h:41-46 analog)."""
        if not self.conf.store_positions:
            raise ValueError(
                "index was built without store_positions=True; "
                "rebuild with IndexConf(store_positions=True) for indexed "
                "phrase search, or use phrase_match() over the raw corpus"
            )
        return self._union_read("positions")

    def hot(self) -> "InvertedIndex":
        """Pin the segment table in executor memory and materialize it —
        steady-state serving mode (the reference keeps its whole block
        directory resident and relies on the OS page cache for blocks,
        src/igd_base.h:96-105; a long-lived Spark service does the same
        with the storage layer). Returns self."""
        self._segments = self.segments.persist()
        self._segments.count()
        self.dictionary.count()
        return self

    # --- introspection (A7 analog: IGDr get_nCtgs/get_binSize/get_binLen/
    # get_binData, IGDr/R/IGDr.R:86-159) ------------------------------------
    def n_shards(self) -> int:
        return self.conf.n_shards

    def block_size(self) -> int:
        return self.conf.block_size

    def term_df(self, term: str) -> int:
        row = self.dictionary.filter(F.col("term") == term).select("df").collect()
        return int(row[0]["df"]) if row else 0

    def term_id(self, term: str) -> int:
        row = self.dictionary.filter(F.col("term") == term).collect()
        return int(row[0]["term_id"]) if row else 0

    def block_len(self, term: str, block_id: int, salt: int = 0) -> int:
        row = (
            self.segments.filter(
                (F.col("term") == term)
                & (F.col("block_id") == block_id)
                & (F.col("salt") == salt)
            )
            .select("n")
            .collect()
        )
        return int(row[0]["n"]) if row else 0

    def block_postings(self, term: str, block_id: int, salt: int = 0):
        """Decoded (doc_ids, tfs) numpy arrays for one block — get_binData
        analog (IGDr/src/igd_base.c:396-455)."""
        from igd_spark import codec

        rows = (
            self.segments.filter(
                (F.col("term") == term)
                & (F.col("block_id") == block_id)
                & (F.col("salt") == salt)
            )
            .select("doc_ids", "tfs")
            .collect()
        )
        if not rows:
            import numpy as np

            return np.empty(0, dtype="int64"), np.empty(0, dtype="int32")
        return (
            codec.decode_doc_ids(bytes(rows[0]["doc_ids"])),
            codec.decode_tfs(bytes(rows[0]["tfs"])),
        )


def build_index(
    spark: SparkSession,
    docs: DataFrame,
    path: str,
    conf: IndexConf = DEFAULT_CONF,
    text_col: str = "text",
    id_col: str | None = "doc_id",
    resume: bool = False,
) -> InvertedIndex:
    """`igd create` analog. Stage-committed with lineage rows; with
    resume=True, stages whose lineage marker exists are skipped — the
    checkpointed batch loop of src/igd_create.c:50-88.

    If id_col is None, stable doc ids are assigned from (conv_id, turn_idx)
    per conf.doc_id_method (transcript path).
    """
    if not resume and os.path.exists(os.path.join(path, "_meta.json")):
        # existing-db guard (B9, src/igd_create.c:480-482)
        raise FileExistsError(f"index already exists at {path}; pass resume=True")
    if id_col is None:
        docs = assign_doc_ids(docs, conf)
        id_col = "doc_id"
    t0 = time.time()
    parts = build_all(docs, conf=conf, text_col=text_col, id_col=id_col)

    def commit(stage: str, df: DataFrame, writer) -> None:
        if resume and _stage_done(path, stage):
            return
        n = writer(df)
        _write_lineage(path, stage, {"rows": n, "secs": time.time() - t0})

    def write_segments(df: DataFrame) -> int:
        # df arrives repartitioned by shard and sorted (shard, term_id, salt,
        # block_id) from build_segments — the partitioned write adds no
        # shuffle and keeps term runs intact for row-group min/max pruning
        out = os.path.join(path, "segments")
        df.write.mode("overwrite").partitionBy("shard").parquet(out)
        return -1  # row count recorded separately to avoid a second job

    # sequential commits: measured faster than concurrent jobs here (slot
    # contention between the pack shuffle and the sink scans), and the
    # ordered lineage markers give a well-defined resume frontier
    commit(
        "doc_stats", parts["doc_stats"],
        lambda df: _count_write(df, os.path.join(path, "doc_stats")),
    )
    commit(
        "dictionary", parts["dictionary"],
        lambda df: _count_write(df, os.path.join(path, "dictionary")),
    )
    commit("segments", parts["segments"], write_segments)
    if "positions" in parts:
        commit(
            "positions",
            parts["positions"],
            lambda df: (
                df.write.mode("overwrite")
                .partitionBy("shard")
                .parquet(os.path.join(path, "positions")),
                -1,
            )[1],
        )
    for cached in parts.get("_cached", []):
        cached.unpersist()

    meta = {
        "schema_version": SCHEMA_VERSION,
        "conf": asdict(conf),
        "corpus": parts["corpus"],
        "built_secs": time.time() - t0,
    }
    with open(os.path.join(path, "_meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    return InvertedIndex(spark, path, meta)


def _count_write(df: DataFrame, out: str) -> int:
    df.write.mode("overwrite").parquet(out)
    return -1


def append_index(
    spark: SparkSession,
    path: str,
    new_docs: DataFrame,
    text_col: str = "text",
    id_col: str | None = "doc_id",
    batch_tag: str | None = None,
) -> InvertedIndex:
    """Incremental index maintenance — the reference's resumable batched
    ingest (src/igd_create.c:50-88) lifted to a live-append capability.

    New documents' segments are packed with the standard pipeline and
    APPENDED to the same partitioned layout; collection statistics merge
    additively (df' = df + df_delta, sum_dl' = sum_dl + sum_dl_delta,
    n_docs' = n + n_delta) so BM25 scores after append equal a full rebuild.
    Blocks record their build-time avgdl; after the merged avgdl shifts, the
    scorer swaps their stored score bound for a safe (max_tf, min_dl) bound —
    pruning stays rank-safe, only slightly looser, until a compaction rebuild.

    Caller must supply doc_ids disjoint from the existing corpus (the hash
    doc-id scheme guarantees this for new (conv_id, turn_idx) pairs;
    audit_doc_ids() over the union is the paranoid check).

    COMMIT PROTOCOL (atomic, no marker-after-data window): the batch's
    three tables plus its corpus-stats delta.json are written to
    _staging/<tag>/ — invisible to every reader — then ONE
    os.rename(_staging/<tag>, batches/<tag>) publishes all of them at
    once. The batch dir is simultaneously the data, the commit record,
    and the idempotency marker: a replayed batch_tag whose dir exists is
    a no-op, a crash before the rename leaves only staging junk and an
    unchanged live index, and there is no state in between. This is the
    Iceberg snapshot-commit discipline (new files + one atomic metadata
    pointer swap) expressed in plain directories; base tables are never
    touched, so open handles keep serving their snapshot (at-least-once
    callers like Structured Streaming get exactly-once appends).
    """
    if batch_tag is None:
        batch_tag = "append_" + os.urandom(8).hex()
    committed = os.path.join(_batches_root(path), batch_tag)
    # the legacy _stage_done check keeps idempotency for indexes whose
    # appends were committed by the pre-batch-dir protocol (lineage marker
    # applied_<tag> written after the data): a stream replaying its last
    # pre-upgrade micro-batch must still see it as applied, or the batch
    # double-appends and silently corrupts df/BM25 stats
    if os.path.isdir(committed) or _stage_done(path, f"applied_{batch_tag}"):
        return open_index(spark, path)
    idx = open_index(spark, path)
    conf = idx.conf
    if id_col is None:
        if conf.doc_id_method != "hash":
            # dense ids restart at 0 per batch — only the stateless composite
            # hash is append-safe (SURVEY §7.3c)
            raise ValueError("append with auto ids requires doc_id_method='hash'")
        new_docs = assign_doc_ids(new_docs, conf)
        id_col = "doc_id"
    ts = idx.tombstones
    if ts is not None:
        # refuse to append a TOMBSTONED doc_id: the tombstone is a global
        # id filter, so the re-added doc would be invisible immediately and
        # silently destroyed by the next compaction — loud error instead of
        # silent data loss. Re-adding a deleted id (the Lucene update
        # workflow) requires compact_index first (expunge clears the
        # tombstones) or a fresh doc_id.
        n_dead = (
            new_docs.select(F.col(id_col).alias("doc_id"))
            .join(F.broadcast(ts), "doc_id", "left_semi")
            .count()
        )
        if n_dead:
            raise ValueError(
                f"append batch contains {n_dead} doc_id(s) that are "
                "tombstoned on this index; run compact_index(path) to "
                "expunge the deletes first, or assign new doc_ids"
            )
    t0 = time.time()
    parts = build_all(new_docs, conf=conf, text_col=text_col, id_col=id_col)
    delta = parts["corpus"]

    staging = os.path.join(path, "_staging", batch_tag)
    if os.path.isdir(staging):  # leftovers of a crashed prior attempt
        import shutil

        shutil.rmtree(staging)
    parts["segments"].write.mode("overwrite").partitionBy("shard").parquet(
        os.path.join(staging, "segments")
    )
    parts["doc_stats"].write.mode("overwrite").parquet(os.path.join(staging, "doc_stats"))
    # dictionary: DELTA rows — no rewrite; the reader folds df additively
    # and takes max(n_salts) (probe set must cover the union of physical
    # salt values in old + new segments). O(delta vocab) per append instead
    # of O(total vocab) — the stream-rate requirement.
    parts["dictionary"].select("term", "term_id", "df", "n_salts").write.mode(
        "overwrite"
    ).parquet(os.path.join(staging, "dictionary"))
    if "positions" in parts:
        parts["positions"].write.mode("overwrite").partitionBy("shard").parquet(
            os.path.join(staging, "positions")
        )
    with open(os.path.join(staging, "delta.json"), "w") as f:
        json.dump({"batch_tag": batch_tag, "corpus": delta, "secs": time.time() - t0}, f)
    for cached in parts.get("_cached", []):
        cached.unpersist()

    os.makedirs(_batches_root(path), exist_ok=True)
    try:
        os.rename(staging, committed)  # THE commit — atomic on one filesystem
    except OSError:
        if os.path.isdir(committed):  # lost a concurrent race on the same tag
            return open_index(spark, path)
        raise
    # observability only — written after the commit, never load-bearing
    _write_lineage(
        path,
        f"append_{batch_tag}",
        {"rows": delta["n_docs"], "secs": time.time() - t0, "batch_tag": batch_tag},
    )
    return open_index(spark, path)


def delete_docs(
    spark: SparkSession,
    path: str,
    doc_ids: DataFrame,
    delete_tag: str | None = None,
) -> InvertedIndex:
    """Delete documents by id with Lucene tombstone semantics (the ES
    delete/_delete_by_query surface; the reference engine has no delete —
    this is index maintenance the fulltext tier requires).

    Semantics — exactly Lucene's deleted-docs contract: tombstoned docs
    disappear from every search/enumeration result IMMEDIATELY, but
    collection statistics (n_docs, avgdl, df — hence idf and every BM25
    weight) keep counting them until a merge expunges them
    (`compact_index` here).  Surviving docs' scores are therefore
    bit-identical before and after a delete; only the result SET shrinks.

    COMMIT PROTOCOL: the same staging + single-atomic-rename discipline as
    `append_index` — the (doc_id) parquet is written to _staging/, then one
    os.rename publishes it as tombstones/<tag>/.  The tag dir is data,
    commit record, and idempotency marker at once; base tables are never
    touched, and open handles keep serving their snapshot (a handle opened
    before the delete still sees the docs — Iceberg snapshot isolation).

    Scale: a tombstone batch is one narrow distinct write; readers fold all
    batches with a broadcast anti-join (DataFrame paths) or a sorted-array
    searchsorted filter (numpy kernels).  Run `compact_index` when the
    tombstone set grows past a small corpus fraction — expunge restores
    zero-cost reads and exact stats.

    One deliberate divergence from Lucene: identity here is the caller's
    doc_id (Lucene's internal docids are never reused).  Re-adding a
    tombstoned doc_id via `append_index` is therefore REFUSED with a loud
    error (the tombstone would hide and then destroy the new version) —
    expunge first, or assign a fresh doc_id.
    """
    if delete_tag is None:
        delete_tag = "del_" + os.urandom(8).hex()
    committed = os.path.join(_tombstones_root(path), delete_tag)
    if os.path.isdir(committed):  # replayed tag → idempotent no-op
        return open_index(spark, path)
    idx = open_index(spark, path)  # also refuses a dirty index
    t0 = time.time()
    staging = os.path.join(path, "_staging", "tombstone_" + delete_tag)
    if os.path.isdir(staging):
        import shutil

        shutil.rmtree(staging)
    ids = (
        doc_ids.select(F.col(doc_ids.columns[0]).cast("long").alias("doc_id"))
        .dropna()
        .distinct()
    )
    ids.write.mode("overwrite").parquet(staging)
    os.makedirs(_tombstones_root(path), exist_ok=True)
    try:
        os.rename(staging, committed)  # THE commit — atomic on one filesystem
    except OSError:
        if os.path.isdir(committed):  # lost a concurrent race on the same tag
            return open_index(spark, path)
        raise
    _write_lineage(
        path,
        f"delete_{delete_tag}",
        {"secs": time.time() - t0, "delete_tag": delete_tag,
         "prior_deletes": len(idx.tombstone_tags)},
    )
    return open_index(spark, path)


def delete_by_query(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    min_tf: int = 0,
    delete_tag: str | None = None,
) -> InvertedIndex:
    """ES ``_delete_by_query``: tombstone every doc matching ≥1 term of
    ``queries`` (query_id, query_text), optionally tf-filtered.  The match
    set comes from the index's own pruned-block enumeration — no corpus
    scan — then feeds `delete_docs` (one narrow distinct write + atomic
    rename).  The enumeration respects EXISTING tombstones, so re-running
    the same delete-by-query is a cheap no-op-sized batch."""
    from igd_spark.search import match_enumerate

    idx = open_index(spark, path)
    me = match_enumerate(spark, idx, queries)
    if min_tf > 0:
        me = me.filter(F.col("tf") >= min_tf)
    return delete_docs(
        spark, path, me.select("doc_id").distinct(), delete_tag=delete_tag
    )


def purge_staging(path: str, active_tags: set[str] | None = None) -> list[str]:
    """Delete crashed-append leftovers under <path>/_staging. Staging dirs
    are invisible to readers and a crashed append never retries under a
    NEW tag (retries reuse the tag and clear their own leftovers), so
    anything here not in `active_tags` is dead weight. Run it from a
    maintenance window (e.g. alongside compact_index) — NOT concurrently
    with in-flight appends unless their tags are passed in active_tags.
    Returns the purged tag list."""
    import shutil

    root = os.path.join(path, "_staging")
    if not os.path.isdir(root):
        return []
    purged = []
    for tag in sorted(os.listdir(root)):
        if active_tags and tag in active_tags:
            continue
        shutil.rmtree(os.path.join(root, tag), ignore_errors=True)
        purged.append(tag)
    if not os.listdir(root):
        shutil.rmtree(root, ignore_errors=True)
    return purged


def compact_index(spark: SparkSession, path: str) -> InvertedIndex:
    """Merge append deltas into their base lists, re-sort by doc_id, re-pack
    fixed-size blocks, and refresh every block-max bound under the current
    merged avgdl — restores the tight-pruning invariant append_index trades
    away. Also folds the dictionary delta rows into one physical row per
    term. Stats are already exact (additive merges); one shuffle per table,
    same as a build."""
    from igd_spark.build import repack_segments

    idx = open_index(spark, path)  # handle over base ∪ batches, folded stats
    t0 = time.time()
    # EXPUNGE (Lucene force-merge): tombstoned postings are dropped during
    # the repack decode, doc_stats shrinks by anti-join, and — unlike the
    # tombstone phase, which freezes stats — n_docs/avgdl/df are recomputed
    # so the compacted index is bit-identical to a fresh build over the
    # surviving corpus (rank-identity-tested). The deleted set rides a
    # Spark broadcast (sorted int64; ~8 B/doc — the size compact_index
    # exists to keep bounded).
    tomb = idx.tombstones_array()
    deleted_bc = (
        spark.sparkContext.broadcast(tomb)
        if tomb is not None and tomb.size
        else None
    )
    if deleted_bc is not None:
        live_ds = idx.live_docs(idx.doc_stats)
        st = live_ds.agg(
            F.count("*").alias("n"),
            F.coalesce(F.sum("dl"), F.lit(0)).cast("long").alias("s"),
        ).collect()[0]
        n_docs2, sum_dl2 = int(st["n"]), int(st["s"])
        avgdl2 = (sum_dl2 / n_docs2) if n_docs2 else 0.0
    else:
        live_ds = idx.doc_stats
        avgdl2 = idx.avgdl
    new_seg = repack_segments(idx.segments, idx.conf, avgdl2, deleted=deleted_bc)
    tmp = os.path.join(path, "segments_compacted")
    new_seg.write.mode("overwrite").partitionBy("shard").parquet(tmp)
    tmp_dict = os.path.join(path, "dictionary_compacted")
    if deleted_bc is None:
        idx.dictionary.write.mode("overwrite").parquet(tmp_dict)
    else:
        # df after expunge = surviving postings per term — read back off the
        # just-written segments (one narrow scan); zero-df terms drop out.
        # n_salts is recomputed too (max surviving salt + 1): a hot term
        # whose upper-salt postings were all deleted stops probing shards
        # that hold nothing for it
        surv = (
            spark.read.parquet(tmp)
            .groupBy("term_id")
            .agg(
                F.sum("n").cast("long").alias("df"),
                (F.max("salt") + 1).cast("int").alias("n_salts"),
            )
        )
        idx.dictionary.drop("df", "n_salts").join(surv, "term_id").select(
            "term", "term_id", "df", "n_salts"
        ).write.mode("overwrite").parquet(tmp_dict)
    idx.dictionary.unpersist()
    idx._dictionary = None
    tmp_ds = os.path.join(path, "doc_stats_compacted")
    live_ds.write.mode("overwrite").parquet(tmp_ds)
    tmp_pos = None
    if idx.conf.store_positions:
        from igd_spark.build import repack_position_segments

        tmp_pos = os.path.join(path, "positions_compacted")
        repack_position_segments(idx.positions, idx.conf, deleted=deleted_bc).write.mode(
            "overwrite"
        ).partitionBy("shard").parquet(tmp_pos)
    # marker covers the swaps + batch-dir removal (the tmp writes are
    # invisible to readers); a crash inside leaves the dirty marker and
    # open_index refuses until repaired
    _begin_mutation(path, "compact", f"compact_{idx.meta.get('compactions', 0) + 1}")
    _swap_dir(os.path.join(path, "segments"), tmp)
    _swap_dir(os.path.join(path, "dictionary"), tmp_dict)
    _swap_dir(os.path.join(path, "doc_stats"), tmp_ds)
    if tmp_pos is not None:
        _swap_dir(os.path.join(path, "positions"), tmp_pos)
    if idx.batches:
        import shutil

        # remove ONLY the batches this compaction's snapshot folded into
        # the new base — a batch committed concurrently (os.rename into
        # batches/ after our open_index) was not merged, and deleting the
        # whole root would silently destroy its documents; it stays and
        # remains served via union until the next compaction
        for tag in idx.batches:
            shutil.rmtree(os.path.join(_batches_root(path), tag), ignore_errors=True)
        if not _list_batches(path):
            shutil.rmtree(_batches_root(path), ignore_errors=True)
    # retire legacy applied_<tag> idempotency markers: everything they
    # guarded is folded into the new base by this compaction, and leaving
    # them would make a REUSED batch_tag silently no-op instead of append.
    # (Current-protocol appends use the batch dir itself as the marker, so
    # only pre-upgrade markers live here; streaming's legacy-window check
    # independently ends once a new-format batch exists. Compaction is a
    # maintenance window — don't run it concurrently with a mid-replay
    # legacy stream, same discipline as purge_staging.)
    lin = os.path.join(path, "_lineage")
    if os.path.isdir(lin):
        for f in os.listdir(lin):
            if f.startswith("applied_"):
                os.remove(os.path.join(lin, f))
    if idx.tombstone_tags:
        import shutil

        # same discipline as batches: remove ONLY the tombstone batches this
        # compaction's snapshot expunged — a delete committed concurrently
        # (after our open_index) was not folded and must stay live
        for tag in idx.tombstone_tags:
            shutil.rmtree(
                os.path.join(_tombstones_root(path), tag), ignore_errors=True
            )
        if not _list_tombstones(path):
            shutil.rmtree(_tombstones_root(path), ignore_errors=True)
    if deleted_bc is not None:
        # expunged: stats now describe the surviving corpus exactly
        idx.meta["corpus"] = {
            "n_docs": n_docs2,
            "avgdl": avgdl2,
            "sum_dl": sum_dl2,
            "docs_dropped": int(idx.meta["corpus"].get("docs_dropped", 0)),
        }
        deleted_bc.unpersist()
    idx.meta["deletes"] = len(_list_tombstones(path))
    # idx.meta["corpus"] is already the folded totals (open_index folds
    # batch deltas); with the batches merged into the base it becomes the
    # base meta
    idx.meta["appends"] = 0
    idx.meta["compactions"] = idx.meta.get("compactions", 0) + 1
    with open(os.path.join(path, "_meta.json"), "w") as f:
        json.dump(idx.meta, f, indent=1)
    _write_lineage(
        path, f"compact_{idx.meta['compactions']:04d}", {"rows": -1, "secs": time.time() - t0}
    )
    _end_mutation(path)
    return open_index(spark, path)


def maintain_index(
    spark: SparkSession,
    path: str,
    max_batches: int = 8,
    purge: bool = True,
    active_tags: set[str] | None = None,
) -> InvertedIndex:
    """One-call maintenance window — the periodic-housekeeping policy around
    the primitives: purge crashed-append staging leftovers, then compact iff
    the committed append-batch count has reached `max_batches` (each batch
    adds a union branch + delta dictionary rows to every read, and its
    blocks carry the looser post-append score bounds — compaction restores
    the single-table, tight-bound steady state). Cheap no-op otherwise.
    Run from the same scheduled window as any compaction; pass in-flight
    append tags via `active_tags` if appends may overlap the purge."""
    if purge:
        purge_staging(path, active_tags=active_tags)
    idx = open_index(spark, path)
    if len(idx.batches) >= max_batches:
        return compact_index(spark, path)
    return idx


def open_index(
    spark: SparkSession, path: str, allow_dirty: bool = False
) -> InvertedIndex:
    """`igd_py.open` analog (src_py/igd_base.c:161-222): load header metadata
    once; block data stays on disk until queried. Refuses an index whose
    in-progress mutation marker is present (a crash mid-append/compact) —
    pass allow_dirty=True only for forensic inspection."""
    if not allow_dirty and os.path.exists(_lineage_path(path, _INPROGRESS)):
        with open(_lineage_path(path, _INPROGRESS)) as f:
            info = json.load(f)
        raise RuntimeError(
            f"index at {path} has an unfinished {info.get('op')} "
            f"(tag={info.get('tag')}); restore from the _old dir / re-run the "
            "mutation, or open_index(..., allow_dirty=True) to inspect"
        )
    with open(os.path.join(path, "_meta.json")) as f:
        meta = json.load(f)
    if meta.get("schema_version") != SCHEMA_VERSION:
        raise ValueError(f"unsupported index schema: {meta.get('schema_version')}")
    # fold committed append batches into the corpus stats (integer-additive,
    # so the merged BM25 inputs equal a full rebuild's); the batch list is
    # this handle's snapshot
    batches = _list_batches(path)
    if batches:
        n = int(meta["corpus"]["n_docs"])
        sum_dl = int(meta["corpus"].get("sum_dl", 0))
        dropped = int(meta["corpus"].get("docs_dropped", 0))
        for tag in batches:
            with open(os.path.join(_batches_root(path), tag, "delta.json")) as f:
                d = json.load(f)["corpus"]
            n += int(d["n_docs"])
            sum_dl += int(d["sum_dl"])
            dropped += int(d.get("docs_dropped", 0))
        meta["corpus"] = {
            "n_docs": n,
            "avgdl": (sum_dl / n) if n else 0.0,
            "sum_dl": sum_dl,
            "docs_dropped": dropped,
        }
    meta["appends"] = len(batches)
    tombstones = _list_tombstones(path)
    meta["deletes"] = len(tombstones)
    return InvertedIndex(spark, path, meta, batches=batches, tombstones=tombstones)


def index_stats(idx: InvertedIndex) -> DataFrame:
    """Index-level statistics — the ES ``_stats`` / ``_segments``
    introspection surface: ONE row of
    (n_docs, avgdl, sum_dl, n_terms, n_postings, n_blocks, n_batches,
    n_deleted_docs, n_delete_batches, appends, compactions).
    ``n_deleted_docs`` is the ES ``docs.deleted`` count (distinct
    tombstoned ids — THE number the compact-when-it-grows guidance keys
    on); ``n_delete_batches`` the tombstone commit count.  n_postings
    counts stored (doc, term) pairs (each posting lives in exactly one
    salt), n_blocks the physical block rows.  Corpus quantities come from
    the handle's folded metadata (O(1) — sum_dl is always present:
    open_index enforces schema v2); n_terms/n_postings/n_blocks are one
    narrow aggregation over the dictionary / segment tables — vocab- and
    block-count-sized, never corpus-sized."""
    seg = idx.segments.agg(
        F.count("*").cast("long").alias("n_blocks"),
        F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("n_postings"),
    ).collect()[0]
    n_terms = idx.dictionary.count()
    tomb = idx.tombstones_array()
    row = (
        int(idx.n_docs),
        float(idx.avgdl),
        int(idx.meta["corpus"]["sum_dl"]),
        int(n_terms),
        int(seg["n_postings"]),
        int(seg["n_blocks"]),
        len(idx.batches),
        int(tomb.size) if tomb is not None else 0,
        len(idx.tombstone_tags),
        int(idx.meta.get("appends", 0)),
        int(idx.meta.get("compactions", 0)),
    )
    return idx.spark.createDataFrame(
        [row],
        "n_docs long, avgdl double, sum_dl long, n_terms long, "
        "n_postings long, n_blocks long, n_batches int, n_deleted_docs long, "
        "n_delete_batches int, appends int, compactions int",
    )


def snapshot_index(path: str, dest: str) -> str:
    """Point-in-time copy of an index's COMMITTED state — the ES snapshot
    API analog.  Copies base tables, committed append batches, tombstones,
    metadata, and lineage; excludes ``_staging`` (in-flight junk is not
    state).  Refuses a dirty index (unfinished mutation marker) and an
    existing destination.  Because every mutation publishes via atomic
    renames of whole directories, a snapshot taken between mutations is
    internally consistent by construction; like purge_staging, don't run
    it concurrently with a mutation (maintenance-window discipline).

    At production scale this is the Iceberg snapshot-export / S3 prefix
    copy; here it is a directory tree copy."""
    import shutil

    if os.path.exists(_lineage_path(path, _INPROGRESS)):
        raise RuntimeError(
            f"index at {path} has an unfinished mutation; repair before snapshotting"
        )
    if os.path.exists(dest):
        raise FileExistsError(f"snapshot destination already exists: {dest}")
    shutil.copytree(path, dest, ignore=shutil.ignore_patterns("_staging"))
    return dest


def restore_index(spark: SparkSession, snapshot: str, dest: str) -> InvertedIndex:
    """Restore a `snapshot_index` copy to a new location and open it — the
    ES restore API analog.  The restored index is a fully independent
    live index (appends/deletes/compactions on it do not touch the
    snapshot)."""
    snapshot_index(snapshot, dest)
    return open_index(spark, dest)


def set_alias(root: str, name: str, target: str) -> str:
    """Point alias ``name`` (under directory ``root``) at index ``target``
    — the ES index-alias API analog, and the publication half of every
    rewrite-into-a-new-path maintenance op here (reshard_index,
    restore_index): build/reshard to a fresh path, then one atomic alias
    swap makes it live; readers opened through the alias before the swap
    keep their snapshot (open handles hold their own path), readers after
    the swap get the new index. No data moves.

    The alias is a tiny JSON file published via write-to-tmp + os.rename —
    the same single-atomic-rename commit discipline as batch/tombstone
    publication (in production: an Iceberg catalog pointer / table-name
    swap). ``target`` must already be a valid index (refuses otherwise —
    an alias must never dangle)."""
    if not os.path.exists(os.path.join(target, "_meta.json")):
        raise FileNotFoundError(f"alias target is not an index: {target}")
    os.makedirs(root, exist_ok=True)
    final = os.path.join(root, f"{name}.alias.json")
    tmp = final + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"name": name, "target": os.path.abspath(target),
                   "updated_at": time.time()}, f, indent=1)
    os.rename(tmp, final)  # atomic publish/swap
    return final


def resolve_alias(root: str, name: str) -> str:
    """Target path of alias ``name`` — FileNotFoundError if absent."""
    with open(os.path.join(root, f"{name}.alias.json")) as f:
        return json.load(f)["target"]


def open_alias(spark: SparkSession, root: str, name: str) -> InvertedIndex:
    """open_index through an alias — the handle snapshots the CURRENT
    target; later alias swaps don't affect it (same isolation as batch
    snapshots)."""
    return open_index(spark, resolve_alias(root, name))


def reshard_index(
    spark: SparkSession, path: str, dest: str, n_shards: int
) -> InvertedIndex:
    """Re-shard an index to a new shard count — the ES shrink/split API
    analog, run as maintenance when a deployment's executor count outgrows
    (or no longer justifies) the build-time n_shards.

    The whole operation is ONE shuffle of the PACKED block table, never a
    corpus pass: shard is a DERIVED quantity, (term_id % n + salt) % n
    (build.shard_col), not baked into any payload, so every block row moves
    wholesale — no decode, no re-tokenize, no re-sort (within a (term, salt)
    list the block_id order is shard-independent). Contrast the reference,
    where changing the bin geometry (-b, src/igd_create.c:454-457) forces a
    full re-ingest because records are physically duplicated per tile at
    insert time (src/igd_base.c:162-172). At 10^12 turns this is the
    difference between O(index bytes) and O(corpus bytes) for a topology
    change.

    Writes a NEW index at ``dest`` (production: write a new Iceberg table,
    then swap the serving alias); the source stays untouched and serveable.
    Committed append batches fold into the new base (same fold the readers
    apply); tombstones are copied verbatim — doc ids are shard-independent,
    so deletes survive unchanged and the next compact_index on ``dest``
    expunges them as usual.  Salting survives too: shards_for() spreads a
    hot term's salts over consecutive shards mod ANY n, so a salt count
    chosen at build keeps working (n_shards < max_salts just overlaps some
    probe shards — correct, merely less spread)."""
    import shutil

    from igd_spark.build import shard_col
    from igd_spark.session import kernel_parallelism

    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    if os.path.exists(os.path.join(dest, "_meta.json")):
        raise FileExistsError(f"index already exists at {dest}")
    idx = open_index(spark, path)  # refuses a dirty source
    t0 = time.time()
    os.makedirs(dest, exist_ok=True)
    n_parts = kernel_parallelism(spark, n_shards)

    def _move_blocks(df: DataFrame, sub: str) -> None:
        out = df.withColumn(
            "shard", shard_col(F.col("term_id"), F.col("salt"), n_shards)
        )
        # same write discipline as build/compact: partition-sorted so term
        # runs stay contiguous for row-group min/max pruning
        (
            out.repartition(n_parts, "shard")
            .sortWithinPartitions("shard", "term_id", "salt", "block_id")
            .write.mode("overwrite")
            .partitionBy("shard")
            .parquet(os.path.join(dest, sub))
        )
        _write_lineage(dest, sub, {"rows": -1, "secs": time.time() - t0})

    _move_blocks(idx.segments, "segments")
    if idx.conf.store_positions:
        _move_blocks(idx.positions, "positions")
    # dictionary/doc_stats are shard-independent; write the FOLDED views so
    # dest starts with a clean single-row-per-term base (cheap compaction
    # for free — both tables are vocab-/corpus-row-sized, not posting-sized)
    idx.dictionary.select("term", "term_id", "df", "n_salts").write.mode(
        "overwrite"
    ).parquet(os.path.join(dest, "dictionary"))
    _write_lineage(dest, "dictionary", {"rows": -1, "secs": time.time() - t0})
    idx.doc_stats.write.mode("overwrite").parquet(os.path.join(dest, "doc_stats"))
    _write_lineage(dest, "doc_stats", {"rows": -1, "secs": time.time() - t0})
    for tag in idx.tombstone_tags:
        shutil.copytree(
            os.path.join(_tombstones_root(path), tag),
            os.path.join(_tombstones_root(dest), tag),
        )
    idx.dictionary.unpersist()
    old_n = idx.conf.n_shards
    meta = {
        **idx.meta,  # corpus stats already folded over batches by open_index
        "conf": {**asdict(idx.conf), "n_shards": n_shards},
        "appends": 0,
        "resharded": {"from": path, "old_n_shards": old_n, "new_n_shards": n_shards},
    }
    with open(os.path.join(dest, "_meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    _write_lineage(
        dest,
        f"reshard_{old_n}_to_{n_shards}",
        {"rows": -1, "secs": time.time() - t0},
    )
    return open_index(spark, dest)


def reindex(
    spark: SparkSession,
    docs: DataFrame,
    dest: str,
    where: str | None = None,
    transform=None,
    conf: "IndexConf | None" = None,
) -> InvertedIndex:
    """The ES ``_reindex`` API: build a FRESH index at ``dest`` from the
    source corpus, optionally restricted by ``where`` (the reindex body's
    ``query``, a SQL predicate pushed into the corpus scan) and/or
    reshaped by ``transform`` (the ``script``: a DataFrame -> DataFrame
    callable applied after the filter).  The source index — and its
    corpus table — stay untouched and serveable; swap the serving alias
    (`set_alias`) when the copy is ready, exactly the ES zero-downtime
    pattern.

    Semantics note (the reason reindex ≠ `filtered_bm25_topk`): the new
    index's statistics (df, N, avgdl) come from the SELECTED subset, so
    BM25 over the reindexed copy scores with subset idf — ES behaves the
    same way, because _reindex copies documents, not collection stats.
    `filtered_bm25_topk` is the other contract (filter the MATCH SET,
    keep corpus-global stats); both are gate-verified.

    This engine stores no ``_source`` (the corpus table IS the source of
    record — the Iceberg analog of _source), so reindex reads the corpus
    table rather than the index, which is strictly cheaper: predicate
    pushdown prunes the scan (`where` reaches the parquet reader), where
    ES must scroll the whole source index.  Cost is O(selected corpus) —
    one standard build over the selection, same plan shape as
    `build_index` (reference analog: `igd create` over a restricted file
    list, src/igd_create.c:130-166)."""
    src = docs
    if where:
        src = src.filter(where)
    if transform is not None:
        src = transform(src)
        if "doc_id" not in src.columns:
            raise ValueError("transform must preserve the doc_id column")
    return build_index(spark, src, dest, conf=conf or DEFAULT_CONF)


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def _next_generation(target: str) -> str:
    """ES rollover naming: `name-NNNNNN` increments the numeric suffix;
    a target without one gets `-000002` (its implicit generation is 1)."""
    base = os.path.basename(os.path.normpath(target))
    parent = os.path.dirname(os.path.normpath(target))
    head, _sep, tail = base.rpartition("-")
    if head and tail.isdigit():
        nxt = f"{head}-{int(tail) + 1:0{len(tail)}d}"
    else:
        nxt = f"{base}-000002"
    return os.path.join(parent, nxt)


def rollover_index(
    spark: SparkSession,
    root: str,
    name: str,
    max_docs: int | None = None,
    max_age_s: float | None = None,
    max_bytes: int | None = None,
    conf: "IndexConf | None" = None,
    dry_run: bool = False,
) -> dict:
    """The ES ILM ``rollover`` API: when the write alias's CURRENT target
    breaches any condition, create a fresh EMPTY generation next to it
    (``-NNNNNN`` suffix incremented) and atomically swap the alias.  The
    old generation stays on disk for reads — `search_federated` over the
    generations is the read path (exact global stats, rank-identical to
    one merged index), retention = deleting a generation directory.

    Conditions (any-of, the ES contract; None = not tested):
      max_docs   — live doc count from the index metadata (O(1), the
                   additive corpus stats appends maintain)
      max_age_s  — seconds since the generation was created (_meta.json
                   mtime: written once at build, never rewritten)
      max_bytes  — on-disk bytes of the generation (directory walk here;
                   in production the table format's snapshot statistics)

    Returns {rolled, old_target, new_target, conditions} where
    ``conditions`` holds each tested condition's measured value and
    verdict.  ``dry_run=True`` evaluates without creating or swapping.
    The new generation is built with the old one's IndexConf unless
    ``conf`` overrides it; the empty build is a legal index (searches
    return 0 rows) that fills by `append_index`.

    Contrast the reference: its database is create-once (igd_create runs
    to completion, src/igd_create.c:50-88) with no serving-pointer layer;
    rollover is the piece that makes the batched ingest an ENDLESS write
    path — bounded-size generations, O(1) swap, per-generation
    maintenance (reshard/compact/retire) that never touches the full
    history.
    """
    from igd_spark.corpus import TRANSCRIPT_SCHEMA, assign_doc_ids

    target = resolve_alias(root, name)
    idx = open_index(spark, target)
    n_docs = int(idx.meta["corpus"]["n_docs"])
    age_s = time.time() - os.path.getmtime(os.path.join(target, "_meta.json"))
    evaluated: dict[str, dict] = {}
    if max_docs is not None:
        evaluated["max_docs"] = {"value": n_docs, "limit": max_docs,
                                 "met": n_docs >= max_docs}
    if max_age_s is not None:
        evaluated["max_age_s"] = {"value": age_s, "limit": max_age_s,
                                  "met": age_s >= max_age_s}
    if max_bytes is not None:
        size = _dir_bytes(target)
        evaluated["max_bytes"] = {"value": size, "limit": max_bytes,
                                  "met": size >= max_bytes}
    if not evaluated:
        raise ValueError("rollover_index needs at least one condition")
    rolled = any(c["met"] for c in evaluated.values())
    out = {"rolled": rolled, "old_target": target, "new_target": None,
           "conditions": evaluated}
    if not rolled or dry_run:
        out["rolled"] = rolled and not dry_run
        out["would_roll"] = rolled
        return out
    new_path = _next_generation(target)
    empty = assign_doc_ids(
        spark.createDataFrame([], TRANSCRIPT_SCHEMA), idx.conf
    )
    build_index(spark, empty, new_path, conf=conf or idx.conf)
    set_alias(root, name, new_path)  # atomic swap — writers follow the alias
    out["new_target"] = new_path
    return out


def update_by_query(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    transform: dict[str, str],
    docs: DataFrame,
    update_tag: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tf: int = 0,
) -> InvertedIndex:
    """ES ``_update_by_query``: re-index every doc matching ≥1 query term
    with ``transform`` applied — a dict of column → SQL expression (the
    painless ctx._source script analog, same shared-dialect contract as
    `script_score_topk`).  ``docs`` supplies the matched docs' source
    columns (the index stores postings, not documents — ES reads
    _source the same way).

    Copy-on-write identity: ES keeps _id and bumps _version; this
    engine's doc identity is content-addressed (hash ids), so the updated
    doc gets the NEW deterministic id h60('upd|<update_tag>|<old_id>')
    and the original is tombstoned — the mapping is a pure expression any
    caller (or the oracle) can recompute.  Internally ES update-by-query
    is itself snapshot + delete + reindex; this is that, made explicit.

    Lucene frozen-stats contract carries over: until `compact_index`,
    collection statistics still count the tombstoned originals, and the
    appended copies ADD to them (both versions weigh in idf/avgdl — the
    exact between-refresh-and-merge state of an ES update); compaction
    restores clean rebuilt-corpus statistics.

    COMMIT ORDER: the append publishes BEFORE the delete, so a crash
    between the two leaves both versions visible (the transient state ES
    itself exposes mid-update), never neither.  Both halves are
    idempotent under ``update_tag`` — rerunning the same call completes
    or no-ops; the match set is enumerated from the pre-append snapshot
    handle, so the freshly appended copies can never self-match into the
    delete.

    Scale: match enumeration is the pruned-block path (query-sized);
    the transform is a projection over the matched docs only (left-semi
    BEFORE any per-column work); one append batch + one tombstone batch,
    both atomic renames."""
    from igd_spark.hashing import h60_col
    from igd_spark.search import match_enumerate

    if not transform:
        raise ValueError("transform must map at least one column to an expression")
    idx = open_index(spark, path)  # pre-append snapshot pins the match set
    me = match_enumerate(spark, idx, queries)
    if min_tf > 0:
        me = me.filter(F.col("tf") >= min_tf)
    ids = me.select("doc_id").distinct()
    matched = docs.join(
        ids.withColumnRenamed("doc_id", "_mid"),
        docs[id_col] == F.col("_mid"),
        "left_semi",
    )
    updated = matched
    for col, expr in transform.items():
        updated = updated.withColumn(col, F.expr(expr))
    updated = updated.withColumn(
        id_col,
        h60_col(F.concat(F.lit(f"upd|{update_tag}|"), F.col(id_col).cast("string"))),
    )
    append_index(
        spark, path, updated, text_col=text_col, id_col=id_col,
        batch_tag=f"updq-{update_tag}",
    )
    return delete_docs(spark, path, ids, delete_tag=f"updq-{update_tag}")
