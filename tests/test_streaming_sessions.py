"""Stateful streaming sessionization ≡ batch lag+cumsum twin (closed
sessions), including state carry-over across micro-batches."""

from __future__ import annotations

import os
import time

import pandas as pd
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from modernsearchengines_spark.streaming.sessions import sessionize_stream

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TESTS", "/root/testdata/sf0.001")


def batch_sessions(events):
    """The batch formulation (mirror of __spark_entry__.q_events_sessions,
    0-based ids)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.when(
        F.unix_micros(F.col("ts").cast("timestamp"))
        - F.lag(F.unix_micros(F.col("ts").cast("timestamp"))).over(w)
        > 1800 * 1_000_000,
        1,
    ).otherwise(0)
    return (
        events.withColumn("_new", gap)
        .withColumn(
            "session_id",
            F.sum("_new").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("event_id").alias("first_event"),
        )
    )


def _time_split_stream_dir(tmp_path, name, n_files):
    events_pd = pd.read_parquet(f"{SF_DIR}/events.parquet").sort_values("ts")
    in_dir = tmp_path / name
    in_dir.mkdir()
    chunks = [
        events_pd.iloc[i * len(events_pd) // n_files:
                       (i + 1) * len(events_pd) // n_files]
        for i in range(n_files)
    ]
    for i, chunk in enumerate(chunks):
        p = in_dir / f"part-{i:02d}.parquet"
        chunk.to_parquet(p)
        t = time.time() - (n_files - i) * 10
        os.utime(p, (t, t))
    return in_dir, chunks


def test_watermarked_window_agg_equals_batch_closed_windows(spark, tmp_path):
    from modernsearchengines_spark.streaming.ingest import windowed_counts_stream

    n_files = 3
    in_dir, chunks = _time_split_stream_dir(tmp_path, "win_in", n_files)
    schema = spark.read.parquet(f"{SF_DIR}/events.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(in_dir))
    )
    out_dir = tmp_path / "win_out"
    q = (
        windowed_counts_stream(stream, watermark="1 second")
        .writeStream.format("parquet")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(tmp_path / "win_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r.ts_hour, r.event_type): r.n_events
        for r in spark.read.parquet(str(out_dir)).collect()
    }
    # Append mode emits a window when the watermark (max seen ts − delay)
    # passes its end; availableNow runs a final no-data batch after the
    # last file, so the terminal watermark reflects ALL input and the
    # closed set is every window ending at or before max(ts) − 1s.
    import datetime as _dt

    import pandas as _pd

    wm = max(_pd.Timestamp(c["ts"].max()) for c in chunks) - _dt.timedelta(
        seconds=1
    )
    batch = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("ts_hour"), F.col("w.end").alias("_end"),
                "event_type", "n_events")
        .collect()
    )
    expected = {
        (r.ts_hour, r.event_type): r.n_events
        for r in batch
        if r._end <= wm.to_pydatetime().replace(tzinfo=None)
    }
    assert len(got) > 0
    assert got == expected


@pytest.mark.parametrize("n_files", [1, 3])
def test_stream_equals_batch_closed_sessions(spark, tmp_path, n_files):
    events_pd = pd.read_parquet(f"{SF_DIR}/events.parquet").sort_values("ts")
    in_dir = tmp_path / f"stream_in_{n_files}"
    in_dir.mkdir()
    # time-ordered file splits: with maxFilesPerTrigger=1 each file is one
    # micro-batch, so sessions spanning splits exercise state carry-over
    chunks = [
        events_pd.iloc[i * len(events_pd) // n_files:
                       (i + 1) * len(events_pd) // n_files]
        for i in range(n_files)
    ]
    for i, chunk in enumerate(chunks):
        p = in_dir / f"part-{i:02d}.parquet"
        chunk.to_parquet(p)
        t = time.time() - (n_files - i) * 10  # strictly increasing mtimes
        os.utime(p, (t, t))

    schema = spark.read.parquet(f"{SF_DIR}/events.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(in_dir))
    )
    out_dir = tmp_path / f"out_{n_files}"
    q = (
        sessionize_stream(stream)
        .writeStream.format("parquet")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(tmp_path / f"ckpt_{n_files}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = {
        (r.user_id, r.session_id): (r.n_events, r.first_event)
        for r in spark.read.parquet(str(out_dir)).collect()
    }

    batch = batch_sessions(spark.read.parquet(f"{SF_DIR}/events.parquet"))
    w_last = Window.partitionBy("user_id")
    expected_df = (
        batch.withColumn("_max", F.max("session_id").over(w_last))
        .filter(F.col("session_id") < F.col("_max"))  # drop open tails
    )
    expected = {
        (r.user_id, r.session_id): (r.n_events, r.first_event)
        for r in expected_df.collect()
    }
    assert got == expected
    assert len(got) > 0  # the fixture must actually close sessions


def test_idle_close_expires_tail_sessions(spark, tmp_path):
    """EventTimeTimeout mode: once the terminal watermark passes last_ts +
    gap, every idle session — including each user's final one — is
    force-closed and emitted, so the stream output equals the FULL batch
    sessionization (not batch minus open tails as in NoTimeout mode).

    A far-future sentinel event (synthetic user) is appended as the last
    micro-batch to advance the event-time watermark past every real
    session's expiry; the availableNow final no-data batch then fires the
    timeouts."""
    in_dir, chunks = _time_split_stream_dir(tmp_path, "idle_in", 3)
    sentinel_user = -999
    last = chunks[-1].iloc[[-1]].copy()
    last["user_id"] = sentinel_user
    last["ts"] = (last["ts"] + pd.Timedelta(days=30)).astype("datetime64[us]")
    p = in_dir / "part-99.parquet"
    last.to_parquet(p, index=False)
    t = time.time()
    os.utime(p, (t, t))
    schema = spark.read.parquet(f"{SF_DIR}/events.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(in_dir))
    )
    out_dir = tmp_path / "idle_out"
    q = (
        sessionize_stream(stream, idle_close=True, watermark="1 second")
        .writeStream.format("parquet")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(tmp_path / "idle_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = {
        (r.user_id, r.session_id): (r.n_events, r.first_event)
        for r in spark.read.parquet(str(out_dir)).collect()
        if r.user_id != sentinel_user
    }
    batch = batch_sessions(spark.read.parquet(f"{SF_DIR}/events.parquet"))
    expected = {
        (r.user_id, r.session_id): (r.n_events, r.first_event)
        for r in batch.collect()
    }
    # The sentinel pushed the watermark ~30 days past the real data, so
    # every real session's expiry (last_ts + gap) has passed: ALL sessions
    # emit, including each user's final one.
    assert got == expected
    # and strictly more than the NoTimeout mode would emit (open tails).
    n_users = len({u for (u, _) in expected})
    assert len(got) > len(expected) - n_users