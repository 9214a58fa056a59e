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

from pyspark.sql import DataFrame, SparkSession

from igd_spark.corpus import TRANSCRIPT_SCHEMA
from igd_spark.index import append_index


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
):
    """Run the stream: every micro-batch is appended to the index at
    index_path via the additive-stats merge (see append_index). With
    available_now=True the query drains all currently-available input and
    stops — the batch-backfill mode; with False it runs continuously.

    Returns the StreamingQuery (caller awaits termination).
    """

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        # batch_tag makes the replayed micro-batch (crash between append and
        # checkpoint commit) a no-op instead of a silent double-append
        append_index(
            spark, index_path, batch_df, id_col=None,
            batch_tag=f"stream_batch_{batch_id:08d}",
        )

    writer = stream_docs.writeStream.foreachBatch(commit_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
