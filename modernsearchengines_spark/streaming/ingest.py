"""Incremental ingestion demo: Structured Streaming → index segments.

The reference has NO streaming surface (SURVEY §2.10): its crawler is an
incremental batch process with a pickle checkpoint.  The Spark-native
analogue offered here is a ``foreachBatch`` pipeline: a stream of docs
(file source in production; any streaming DataFrame here) is cleaned and
appended as RAW posting segments per micro-batch — the same raw-segment
shape the checkpointed batch build uses (operators/checkpoint.py), so the
merge/finalize pass turns accumulated micro-batches into a queryable index.

This keeps exactly-once semantics via the streaming checkpoint + idempotent
per-batch parquet directories, mirroring the `_segments` lineage protocol.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import indexer


def raw_postings_for_batch(batch_df: DataFrame, epoch_id: int) -> DataFrame:
    """Cleaned micro-batch → raw (term, doc_id, tf, positions_vb) postings.

    doc_id here is the stable xxhash64(url) (a streaming batch cannot assign
    global dense ranks); the merge pass can re-map ids if dense ids are
    required.
    """
    clean = indexer.clean_docs(batch_df)
    with_ids = clean.withColumn("doc_id", F.xxhash64("url"))
    return (
        with_ids.withColumn("dp", indexer.doc_postings_udf("url", "text"))
        .select("doc_id", F.explode("dp.postings").alias("p"))
        .select(
            "doc_id",
            F.col("p.term").alias("term"),
            F.col("p.tf").alias("tf"),
            F.col("p.positions_vb").alias("positions_vb"),
        )
    )


def windowed_counts_stream(
    events: DataFrame, window: str = "1 hour", watermark: str = "10 minutes"
) -> DataFrame:
    """Watermarked tumbling-window aggregation (the streaming twin of the
    batch ``events_hourly`` contract entry).

    Append-mode semantics: a window row is emitted exactly once, when the
    event-time watermark (max observed ts − ``watermark``) passes the
    window end; later-than-watermark stragglers are dropped — hence the
    10-minute default late tolerance (a 1-second watermark would silently
    drop any mildly out-of-order event; the deterministic-replay test
    passes ``watermark="1 second"`` explicitly).  State is
    O(open windows × groups) and ages out with the watermark — the
    standard unbounded-stream formulation (no growing state, unlike a
    naive groupBy on event time).  tests/test_streaming_sessions.py
    replays a time-split file sequence and asserts the emitted rows equal
    the batch aggregation restricted to closed windows.
    """
    # watermarks require TIMESTAMP (with zone); fixture tables carry NTZ
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("ts_hour"), "event_type", "n_events"
        )
    )


def start_ingest(stream_df: DataFrame, out_dir: str, checkpoint_dir: str):
    """writeStream.foreachBatch appending one raw segment per micro-batch."""

    def _write(batch_df: DataFrame, epoch_id: int) -> None:
        postings = raw_postings_for_batch(batch_df, epoch_id)
        postings.write.mode("overwrite").parquet(
            f"{out_dir}/raw_postings/segment=stream{epoch_id}"
        )

    return (
        stream_df.writeStream.foreachBatch(_write)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
