"""Real Structured Streaming execution (streaming/windows.py): the same
transformations that pass the batch-equivalent oracle rows must produce
identical results when driven through readStream → Trigger.AvailableNow
→ memory sink — plus watermark late-row semantics on a crafted stream."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from demo_pgvector_spark import tables
from demo_pgvector_spark.streaming import windows as sw

SF_DIR = "/root/testdata/sf0.001"


def _collect_sorted(df):
    return sorted(tuple(r) for r in df.collect())


def test_stream_matches_batch_windowed_counts(spark):
    batch = sw.windowed_counts(tables.load(spark, SF_DIR, "events"))
    stream = sw.windowed_counts(sw.read_events_stream(spark, SF_DIR))
    assert stream.isStreaming
    sw.run_to_memory(stream, "wc_test")
    got = _collect_sorted(spark.table("wc_test"))
    want = _collect_sorted(batch)
    assert got == want


def test_stream_matches_batch_session_windows(spark):
    batch = sw.session_windows(tables.load(spark, SF_DIR, "events"))
    stream = sw.session_windows(sw.read_events_stream(spark, SF_DIR))
    sw.run_to_memory(stream, "sess_test")
    assert _collect_sorted(spark.table("sess_test")) == _collect_sorted(batch)


def test_watermark_drops_late_rows(spark, tmp_path):
    """A row arriving far behind the watermark must be dropped by the
    streaming aggregation (and kept by batch) — the semantics only the
    streaming engine has."""
    on_time = [(i, f"2024-01-01 10:{m:02d}:00", "click", 1.0) for i, m in enumerate(range(0, 50, 5))]
    late = [(99, "2024-01-01 10:00:01", "click", 1.0)]  # 45+ min behind max ts

    def write(rows, path):
        spark.createDataFrame(
            rows, "event_id long, ts_s string, event_type string, value double"
        ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s").write.mode(
            "overwrite"
        ).parquet(path)

    d1, d2 = str(tmp_path / "b1"), str(tmp_path / "b2")
    write(on_time, d1)
    write(late, d2)

    schema = spark.read.parquet(d1).schema
    # two micro-batches: on-time files first, then the late file
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "b*"))
    )
    agg = sw.windowed_counts(stream, window="10 minutes", watermark="10 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("late_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    total = spark.table("late_test").agg(F.sum("n")).first()[0]
    # batch would count 11 (10 on-time + 1 late); the stream processes
    # b1 first (earlier mtime, maxFilesPerTrigger=1), advancing the
    # watermark to max(ts)-10min = 10:35, so the 10:00:01 row in b2 is
    # late beyond the watermark and dropped: exactly 10 survive.
    assert total == 10
