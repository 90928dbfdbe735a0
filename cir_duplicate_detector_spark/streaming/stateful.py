"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState`` with event-time timeouts.

This is the streaming twin of ``operators.events.sessionize`` — same
output, same DuckDB oracle — but computed incrementally: per-user state
holds the open session; closed sessions are emitted as soon as the gap
is observed, and open sessions flush when the event-time watermark
passes ``session_end + gap`` (the state timeout).

Batch-driven determinism: the driver stages the events file plus two
far-future *sentinel* files and processes one file per micro-batch.
The sentinel batches advance the watermark past every real session's
timeout, so all open sessions flush before the availableNow trigger
terminates — the classic "advance the watermark to drain state"
pattern. On a live cluster the same operator runs unmodified with a
processing-time trigger; sessions then flush as real time passes.

State is vectorized: session boundaries, per-session counts and sums
are numpy reductions over the Arrow batch, not per-row Python.
Value sums are accumulated as integer cents (the events ``value``
column is 2-decimal money-like data), matching the batch operator's
DECIMAL accumulation bit-for-bit.
"""

from __future__ import annotations

import os
import tempfile
import time
import uuid
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.events import SESSION_GAP_US
from ..sources.tables import with_event_time

OUTPUT_SCHEMA = (
    "user_id bigint, session_id bigint, session_start_us bigint, "
    "session_end_us bigint, n_events bigint, sum_value double"
)
# Open-session accumulator + next session ordinal for the user.
STATE_SCHEMA = (
    "s_start bigint, s_end bigint, s_n bigint, s_cents bigint, s_sid bigint"
)

SENTINEL_USER = -1
# 2030-01-01 UTC in epoch nanos — far beyond any testdata event time.
_SENTINEL_NS = 1_893_456_000 * 1_000_000_000


def _make_sessionize_fn(gap_us: int):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key

        def row(sid: int, start: int, end: int, n: int, cents: int) -> dict:
            return {
                "user_id": user_id,
                "session_id": sid,
                "session_start_us": start,
                "session_end_us": end,
                "n_events": n,
                "sum_value": cents / 100.0,
            }

        if state.hasTimedOut:
            start, end, n, cents, sid = state.get
            state.remove()
            yield pd.DataFrame([row(sid, start, end, n, cents)])
            return

        ev = pd.concat(list(pdfs))
        ev = ev.sort_values(["ts_us", "event_id"])
        ts = ev["ts_us"].to_numpy(dtype="int64")
        cents = np.rint(ev["value"].to_numpy(dtype="float64") * 100).astype(
            "int64"
        )

        # Session segmentation, vectorized: boundary where the inter-
        # event gap exceeds gap_us; reduceat folds each segment.
        first = np.zeros(len(ts), dtype=bool)
        first[0] = True
        first[1:] = (ts[1:] - ts[:-1]) > gap_us
        starts_idx = np.flatnonzero(first)
        ends_idx = np.append(starts_idx[1:], len(ts)) - 1
        seg_start = ts[starts_idx]
        seg_end = ts[ends_idx]
        seg_n = np.append(starts_idx[1:], len(ts)) - starts_idx
        seg_cents = np.add.reduceat(cents, starts_idx)

        out: list[dict] = []
        if state.exists:
            o_start, o_end, o_n, o_cents, sid = state.get
            if seg_start[0] - o_end <= gap_us:
                # First segment continues the open session.
                seg_start[0] = o_start
                seg_n[0] += o_n
                seg_cents[0] += o_cents
            else:
                out.append(row(sid, o_start, o_end, o_n, o_cents))
                sid += 1
        else:
            sid = 0

        for i in range(len(seg_start) - 1):  # all but the last close now
            out.append(
                row(sid, int(seg_start[i]), int(seg_end[i]), int(seg_n[i]),
                    int(seg_cents[i]))
            )
            sid += 1

        last = len(seg_start) - 1
        state.update(
            (int(seg_start[last]), int(seg_end[last]), int(seg_n[last]),
             int(seg_cents[last]), int(sid))
        )
        # Flush when event time passes the gap horizon for this session.
        state.setTimeoutTimestamp(int(seg_end[last]) // 1000 + gap_us // 1000 + 1)
        if out:
            yield pd.DataFrame(out)

    return fn


def _stage_with_sentinels(sf_dir: str) -> str:
    """Stage dir: the real events file first (oldest mtime), then two
    sentinel files. File order = micro-batch order; the two sentinel
    batches guarantee (a) the watermark advances past every session
    timeout and (b) a further batch exists in which those timeouts fire.

    The sentinel ``ts`` is written in the SAME physical type as the
    real events file (raw int64 nanos or timestamp[us], depending on
    the testdata generation) so the fixed readStream schema fits both.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    from .windows import stage_source

    stage = stage_source(
        f"{sf_dir}/events.parquet", "events_stateful_", name="a_events"
    )
    # Probe the ts physical type from a staged data file (the source
    # may be a single file or a directory of part files).
    probe = sorted(
        f for f in os.listdir(stage) if f.startswith("a_events")
    )[0]
    ts_type = pq.read_schema(os.path.join(stage, probe)).field("ts").type
    now = time.time()
    for i in (1, 2):
        path = os.path.join(stage, f"z_sentinel{i}.parquet")
        ts_ns = _SENTINEL_NS + i * 10**9
        if pa.types.is_integer(ts_type):
            ts_arr = pa.array([ts_ns], ts_type)
        else:
            ts_arr = pa.array([ts_ns // 1000], pa.timestamp("us")).cast(
                ts_type
            )
        tbl = pa.table(
            {
                "event_id": pa.array([-i], pa.int64()),
                "ts": ts_arr,
                "user_id": pa.array([SENTINEL_USER], pa.int64()),
                "event_type": pa.array(["__sentinel__"], pa.string()),
                "value": pa.array([0.0], pa.float64()),
                "props": pa.array(["{}"], pa.string()),
            }
        )
        pq.write_table(tbl, path)
        os.utime(path, (now + 10 * i, now + 10 * i))
    return stage


def streaming_sessionize(
    spark: SparkSession, sf_dir: str, gap_us: int = SESSION_GAP_US
) -> DataFrame:
    """Run gap sessionization as a stateful streaming query over the
    events parquet; returns the drained result as a batch DataFrame
    (identical to ``operators.events.sessionize``).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stage = _stage_with_sentinels(sf_dir)
    # State partitioning is fixed at query start from shuffle.partitions;
    # each state partition costs a store instance + an Arrow python
    # worker round-trip PER MICRO-BATCH. Cap it for this bounded drain
    # job (a live deployment sizes it to key cardinality instead).
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    # Two micro-batches total: batch 1 = ALL event data files +
    # sentinel 1 (the post-batch watermark jumps past every real
    # session timeout), batch 2 = sentinel 2 (the timeouts fire and
    # drain state). The data files MUST share one batch: the corpus is
    # not time-ordered across part files, so splitting it over batches
    # lets an early batch's watermark overtake a later file's events
    # and the handler's timeout-set then throws
    # INVALID_TIMEOUT_TIMESTAMP (hit when the replica corpus staged 32
    # part files through the old fixed maxFilesPerTrigger=2).
    n_data = sum(1 for f in os.listdir(stage) if f.startswith("a_events"))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", n_data + 1)
        .parquet(stage)
    )
    stream = with_event_time(stream).select(
        "user_id", "event_id", "ts_us", "ts_ts", "value"
    )
    sessions = (
        stream.withWatermark("ts_ts", "0 seconds")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_sessionize_fn(gap_us),
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
    name = f"stream_sess_{uuid.uuid4().hex[:8]}"
    # This drain job's checkpoint is throwaway (the result is returned as
    # a batch DataFrame); put the per-batch state/offset commits on
    # tmpfs when available instead of paying disk fsyncs. A durable
    # deployment points this at reliable storage instead.
    ckpt_base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    ckpt = tempfile.mkdtemp(prefix="stream_sess_ckpt_", dir=ckpt_base)
    try:
        query = (
            sessions.writeStream.format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    return spark.table(name).where(F.col("user_id") != SENTINEL_USER)
