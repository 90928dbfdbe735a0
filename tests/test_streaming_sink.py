"""Streaming file sink: exactly-once output across a restart."""

from __future__ import annotations

from cir_duplicate_detector_spark.streaming.windows import (
    streaming_dedup_to_parquet,
)

SF = "/root/testdata/sf0.001"


def test_streaming_sink_exactly_once_across_restart(spark, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    expected = spark.read.parquet(f"{SF}/events.parquet").count()

    streaming_dedup_to_parquet(spark, SF, out, ckpt)
    first = spark.read.parquet(out)
    assert first.count() == expected
    assert first.select("event_id").distinct().count() == expected

    # Restart over the same input + checkpoint: offsets are committed,
    # so the second run must add nothing.
    streaming_dedup_to_parquet(spark, SF, out, ckpt)
    assert spark.read.parquet(out).count() == expected
