"""Structured Streaming ingestion — continuous transcript arrival feeding
the incremental index (append_index).

The reference is batch-only; its closest structure is the resumable ingest
cursor (i0, L0) over input files (src/igd_create.c:73-88). Structured
Streaming gives the same semantics natively: the checkpoint directory IS the
cursor, each micro-batch is one bounded ingest round, and foreachBatch
commits an index append per round (every append writes its own lineage row,
so a killed stream resumes from the last committed micro-batch).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from igd_spark.corpus import TRANSCRIPT_SCHEMA
from igd_spark.index import append_index
from igd_spark.tokenizer import tokens_col


def transcript_stream(
    spark: SparkSession, source_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream of transcript parquet drops (the production shape:
    new conversation files landing in object storage)."""
    reader = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .format("parquet")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(source_dir)


def stream_append(
    stream_docs: DataFrame,
    index_path: str,
    checkpoint_dir: str,
    available_now: bool = True,
    stream_id: str | None = None,
):
    """Run the stream: every micro-batch is appended to the index at
    index_path via the additive-stats merge (see append_index). With
    available_now=True the query drains all currently-available input and
    stops — the batch-backfill mode; with False it runs continuously.

    Idempotency tags are scoped by STREAM identity, not just batch_id:
    batch ids restart at 0 with every new checkpoint dir, so a tag keyed on
    batch_id alone would match a previous stream's applied-markers and
    silently drop genuinely new micro-batches. stream_id defaults to a hash
    of the checkpoint dir path — the same checkpoint genuinely IS the same
    stream (its replays are the duplicates the tag must absorb); a fresh
    checkpoint gets fresh tags. Pass stream_id explicitly when checkpoint
    dirs are rotated but the logical stream continues.

    Returns the StreamingQuery (caller awaits termination).
    """
    if stream_id is None:
        import hashlib

        stream_id = hashlib.md5(checkpoint_dir.encode()).hexdigest()[:12]

    # Legacy-marker upgrade window (pre-stream_id releases tagged batches
    # "stream_batch_<id>" with applied-markers keyed on batch_id ALONE).
    # Those markers are honored ONLY when both hold:
    #   * this checkpoint already has history at start time (a replay of a
    #     committed-but-uncheckpointed legacy batch is only possible when
    #     the stream RESUMES an existing checkpoint — a fresh checkpoint
    #     restarts batch ids at 0 and can never be a legacy replay, yet its
    #     ids would collide with another stream's old markers and silently
    #     drop brand-new data: the bug this window closes);
    #   * this stream_id has no new-format batch committed yet (its first
    #     new-format append proves the upgrade replay is behind us).
    import glob as _glob
    import os as _os

    _offsets = _os.path.join(checkpoint_dir, "offsets")
    resumed_checkpoint = _os.path.isdir(_offsets) and bool(_os.listdir(_offsets))

    def _has_new_format_batch() -> bool:
        pat = _os.path.join(index_path, "batches", f"stream_{stream_id}_*")
        if _glob.glob(pat):
            return True
        lpat = _os.path.join(index_path, "_lineage", f"append_stream_{stream_id}_*")
        return bool(_glob.glob(lpat))

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        # batch_tag makes the replayed micro-batch (crash between append and
        # checkpoint commit) a no-op instead of a silent double-append;
        # legacy markers are honored only inside the upgrade window above
        from igd_spark.index import _stage_done

        if (
            resumed_checkpoint
            and not _has_new_format_batch()
            and _stage_done(index_path, f"applied_stream_batch_{batch_id}")
        ):
            return
        append_index(
            spark, index_path, batch_df, id_col=None,
            batch_tag=f"stream_{stream_id}_{batch_id:08d}",
        )

    writer = stream_docs.writeStream.foreachBatch(commit_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_term_counts(
    stream_docs: DataFrame,
    window: str = "1 minute",
    watermark: str = "2 minutes",
    ts_col: str = "ts",
    text_col: str = "text",
) -> DataFrame:
    """Event-time windowed term counts with a late-data watermark — the
    continuous sibling of term_stats: per (window, term) document-frequency
    deltas a live dictionary/monitoring feed consumes. Spark maintains the
    windowed partial aggregates in its state store and, with the watermark,
    finalizes + evicts windows older than max(event_time) - watermark, so
    state is bounded no matter how long the stream runs (the requirement at
    a production ingest rate). Late rows inside the watermark revise their
    window; later ones are dropped.

    Returns a streaming DataFrame (window struct, term, n) for writeStream
    (append mode emits only finalized windows; update mode emits revisions).
    """
    toks = stream_docs.withWatermark(ts_col, watermark).select(
        F.col(ts_col),
        F.explode(tokens_col(F.col(text_col))).alias("term"),
    ).filter(F.col("term") != "")
    return toks.groupBy(F.window(F.col(ts_col), window), "term").agg(
        F.count("*").alias("n")
    )


CONV_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_turns", T.LongType(), False),
        T.StructField("max_turn_idx", T.IntegerType(), False),
    ]
)

CONV_PROGRESS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("n_turns", T.LongType(), False),
        T.StructField("max_turn_idx", T.IntegerType(), False),
    ]
)


def conversation_progress(stream_docs: DataFrame) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-conversation
    running progress (total turns seen, highest turn_idx) maintained across
    micro-batches in the state store — the arbitrary-state API the brief
    names for operators windowed aggs can't express (state here is a
    running maximum + count keyed by conversation, merged incrementally
    like the reference's per-contig ingest counters, src/igd_create.c:73-88).

    Emits one updated row per conversation per micro-batch that touched it.
    """

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, mx = state.get if state.exists else (0, -1)
        for pdf in pdfs:
            n += len(pdf)
            if len(pdf):
                mx = max(mx, int(pdf["turn_idx"].max()))
        state.update((n, mx))
        yield pd.DataFrame({"conv_id": [key[0]], "n_turns": [n], "max_turn_idx": [mx]})

    return (
        stream_docs.select("conv_id", "turn_idx")
        .groupBy("conv_id")
        .applyInPandasWithState(
            update,
            outputStructType=CONV_PROGRESS_SCHEMA,
            stateStructType=CONV_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


DEDUP_STATE_SCHEMA = T.StructType(
    [
        T.StructField("first_doc_id", T.LongType(), False),
        T.StructField("n_dupes", T.LongType(), False),
    ]
)

DEDUP_OUT_SCHEMA = T.StructType(
    [
        T.StructField("content_hash", T.LongType(), False),
        T.StructField("doc_id", T.LongType(), False),
    ]
)


def streaming_dedup(stream_docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup ACROSS micro-batches — the continuous sibling of
    `exact_dedup`, the filter every streaming ingest pipeline places in
    front of index/training sinks (re-crawls and re-drops of the same
    transcript must not re-enter the corpus): keyed by the 64-bit content
    hash of the normalized text, state remembers the FIRST doc_id seen per
    hash; a batch emits one (content_hash, doc_id) row per hash it sees
    for the first time, and silently absorbs every later copy.  Within one
    micro-batch the lowest doc_id wins (deterministic under replay —
    re-running a crashed batch re-elects the same winner).

    State is 16 bytes per DISTINCT document ever seen — exact dedup is
    unbounded by definition; at production scale either shard the stream
    by hash range so each instance holds a slice, or accept a TTL
    (swap NoTimeout for ProcessingTimeTimeout) to trade exactness within
    the horizon for bounded state, the same trade `dropDuplicates`
    makes with a watermark."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        batch_ids: list[int] = []
        for pdf in pdfs:
            batch_ids.extend(int(x) for x in pdf["doc_id"])
        if state.exists:
            first, n = state.get
            state.update((first, n + len(batch_ids)))
            return iter(())
        first = min(batch_ids)
        state.update((first, len(batch_ids) - 1))
        yield pd.DataFrame({"content_hash": [key[0]], "doc_id": [first]})

    hashed = stream_docs.select(
        F.xxhash64(F.lower(F.col(text_col))).alias("content_hash"),
        F.col("doc_id").cast("long").alias("doc_id"),
    )
    return hashed.groupBy("content_hash").applyInPandasWithState(
        update,
        outputStructType=DEDUP_OUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
