"""Streaming operators beyond ingest: watermarked windowed aggregation and
the applyInPandasWithState custom stateful operator. Both run availableNow
over file drops with a memory sink, asserting exact values (inputs are
deterministic)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from igd_spark.corpus import TRANSCRIPT_SCHEMA


@pytest.fixture()
def drops(spark, tmp_path):
    base = pd.Timestamp("2026-01-01T00:00:00")
    rows = [
        # conv A: 3 turns across two minutes
        ("convA", 0, "user", "spark table scan", None, base),
        ("convA", 1, "assistant", "table join", None, base + pd.Timedelta(seconds=30)),
        ("convA", 2, "user", "table", None, base + pd.Timedelta(seconds=90)),
        # conv B: 1 turn
        ("convB", 0, "user", "spark spark", None, base + pd.Timedelta(seconds=10)),
    ]
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"])
    d = str(tmp_path / "drops")
    spark.createDataFrame(pdf, schema=TRANSCRIPT_SCHEMA).repartition(2).write.parquet(d)
    return d


def test_windowed_term_counts_watermark(spark, drops, tmp_path):
    from igd_spark.streaming import transcript_stream, windowed_term_counts

    stream = transcript_stream(spark, drops)
    agg = windowed_term_counts(stream, window="1 minute", watermark="2 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("wtc")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window"]["start"].isoformat(), r["term"]): r["n"]
        for r in spark.sql("select * from wtc").collect()
    }
    # minute 0: spark(convA t0) + spark,spark(convB) = 3; table: t0+t1 = 2
    assert got[("2026-01-01T00:00:00", "spark")] == 3
    assert got[("2026-01-01T00:00:00", "table")] == 2
    assert got[("2026-01-01T00:00:00", "join")] == 1
    # minute 1: convA t2 "table"
    assert got[("2026-01-01T00:01:00", "table")] == 1
    # watermark is declared on the plan (the state-eviction contract)
    assert "EventTimeWatermark" in agg._jdf.queryExecution().analyzed().toString()


def test_conversation_progress_stateful(spark, drops, tmp_path):
    from igd_spark.streaming import conversation_progress, transcript_stream

    # one file per trigger → multiple micro-batches exercise state carry-over
    stream = transcript_stream(spark, drops, max_files_per_trigger=1)
    prog = conversation_progress(stream)
    q = (
        prog.writeStream.format("memory")
        .queryName("cprog")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from cprog").collect()
    # progress is monotone, so the max update per conv is the final state
    # (memory-sink row order is not the update order)
    final: dict = {}
    for r in rows:
        cur = final.get(r["conv_id"], (0, -1))
        final[r["conv_id"]] = max(cur, (r["n_turns"], r["max_turn_idx"]))
    assert final["convA"] == (3, 2)
    assert final["convB"] == (1, 0)


def test_percolate_stream(spark, drops, tmp_path):
    # reverse search over a document stream: standing Lucene-syntax queries
    # evaluated per micro-batch via foreachBatch; match membership is
    # doc-local (expansions only contribute for terms the doc contains), so
    # the pair set is batch-size-invariant even though scores are batch-local
    from igd_spark.corpus import assign_doc_ids
    from igd_spark.queryparse import percolate
    from igd_spark.streaming import transcript_stream

    standing = [(0, "+table"), (1, '"spark table"'), (2, "spark~1 -join")]
    out_dir = str(tmp_path / "matches")

    def sink(batch, batch_id):
        docs = assign_doc_ids(batch)
        (
            percolate(docs, standing)
            .join(docs.select("doc_id", "conv_id", "turn_idx"), "doc_id")
            .select("query_id", "conv_id", "turn_idx")
            .write.mode("append").parquet(out_dir)
        )

    # one file per trigger -> multiple micro-batches
    stream = transcript_stream(spark, drops, max_files_per_trigger=1)
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["query_id"], r["conv_id"], r["turn_idx"])
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got == {
        (0, "convA", 0),  # +table
        (0, "convA", 1),
        (0, "convA", 2),
        (1, "convA", 0),  # phrase "spark table"
        (2, "convA", 0),  # fuzzy spark, no join
        (2, "convB", 0),
    }


def test_streaming_dedup_first_wins_across_batches(spark, tmp_path):
    import pandas as pd

    from igd_spark.corpus import TRANSCRIPT_SCHEMA, assign_doc_ids
    from igd_spark.streaming import streaming_dedup, transcript_stream

    base = pd.Timestamp("2026-01-01T00:00:00")
    mk = lambda c, t, txt: (c, t, "user", txt, None, base)
    # file 1: two distinct texts (one duplicated in-batch);
    # file 2: re-drop of "alpha beta" (cross-batch dupe) + a new text
    f1 = pd.DataFrame(
        [mk("c1", 0, "alpha beta"), mk("c1", 1, "alpha beta"),
         mk("c2", 0, "gamma delta")],
        columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"],
    )
    f2 = pd.DataFrame(
        [mk("c3", 0, "alpha beta"), mk("c3", 1, "epsilon zeta")],
        columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"],
    )
    d = str(tmp_path / "drops2")
    spark.createDataFrame(f1, schema=TRANSCRIPT_SCHEMA).coalesce(1).write.parquet(d)
    spark.createDataFrame(f2, schema=TRANSCRIPT_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(d)

    stream = assign_doc_ids(transcript_stream(spark, d, max_files_per_trigger=1))
    out = streaming_dedup(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("sdedup")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck_sd"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from sdedup").collect()
    # exactly one winner per distinct text, regardless of batch boundaries
    assert len(rows) == 3
    assert len({r["content_hash"] for r in rows}) == 3
    # the winner for "alpha beta" is the batch-1 minimum doc_id, not the
    # batch-2 re-drop
    ids = {
        r["doc_id"]
        for r in assign_doc_ids(
            spark.read.parquet(d).where("text = 'alpha beta'")
        ).collect()
    }
    batch2_id = {
        r["doc_id"]
        for r in assign_doc_ids(
            spark.read.parquet(d).where("conv_id = 'c3' and turn_idx = 0")
        ).collect()
    }
    winners = {r["doc_id"] for r in rows}
    assert winners & ids
    assert not (winners & batch2_id) or min(ids) in batch2_id
