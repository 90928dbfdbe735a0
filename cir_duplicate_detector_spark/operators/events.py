"""Event-stream batch operators: tumbling-window aggregation and
sessionization. (The Structured Streaming twins live in ``..streaming``.)

Timestamps are handled as epoch MICROSECONDS (bigint): the testdata
parquet stores nanos, Spark reads them as raw longs (nanosAsLong), and
DuckDB truncates the same values to micros — integer arithmetic keeps
the two engines bit-aligned with no timezone or format drift.

Double sums go through DECIMAL(18,2) accumulation (the events `value`
column is 2-decimal money-like data): decimal sums are exact, so they
are order-independent and reproducible — a raw double sum would differ
between engines by accumulation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

HOUR_US = 3_600_000_000
SESSION_GAP_US = 1_800_000_000  # 30 min


def _sum_value_exact():
    return F.sum(F.col("value").cast("decimal(18,2)")).cast("double")


def tumbling_window(events: DataFrame, width_us: int = HOUR_US) -> DataFrame:
    """Per (window, event_type): event count and exact value sum.

    Map-side partial aggregation makes this one shuffle keyed by
    (window_start, event_type) — the canonical scalable rollup.
    """
    bucket = F.expr(f"ts_us div {width_us}")
    return (
        events.withColumn("window_start_us", (bucket * width_us).cast("bigint"))
        .groupBy("window_start_us", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            _sum_value_exact().alias("sum_value"),
        )
    )


def sessionize(events: DataFrame, gap_us: int = SESSION_GAP_US) -> DataFrame:
    """Gap-based sessionization per user: a new session starts when the
    time since the previous event exceeds ``gap_us``.

    Classic two-window formulation (lag → boundary flag → running count);
    both windows share the (user_id, ts_us, event_id) sort so Spark
    evaluates them in one partition pass. Output: one row per session.
    """
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    boundary = (
        F.when(
            F.col("ts_us") - F.lag("ts_us").over(w) > gap_us, F.lit(1)
        )
        .otherwise(F.lit(0))
    )
    with_sess = events.withColumn("boundary", boundary).withColumn(
        "session_id",
        F.sum("boundary")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("bigint"),
    )
    return with_sess.groupBy("user_id", "session_id").agg(
        F.min("ts_us").alias("session_start_us"),
        F.max("ts_us").alias("session_end_us"),
        F.count("*").alias("n_events"),
        _sum_value_exact().alias("sum_value"),
    )
