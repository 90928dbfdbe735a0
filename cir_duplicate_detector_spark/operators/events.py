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


def range_join(
    events: DataFrame,
    windows: DataFrame,
    bucket_us: int = HOUR_US,
    key: str = "user_id",
) -> DataFrame:
    """Bucketed interval join: each event row joins every window row of
    the same ``key`` whose half-open interval ``[start_us, end_us)``
    contains the event's ``ts_us``. Returns the INNER matched pairs
    (all window columns + the event columns).

    Spark has no native range-join optimization — a raw
    ``BETWEEN``-only join degenerates to a per-key nested loop, and a
    key-only equi-join with a post-filter ships every (event, window)
    pair of a hot key through the join before filtering. The scalable
    shape is TIME BUCKETING: windows explode to the buckets they cover,
    events compute their single containing bucket, and the join is a
    plain shuffle-hash equi-join on ``(key, bucket)`` with the interval
    predicate verified inline. An event's bucket is unique, so a
    multi-bucket window meets it at most once — no pair dedup needed.
    Replication factor is ``ceil(span / bucket_us) + 1`` per window;
    pick ``bucket_us`` near the typical span (the standard trade, same
    as the PDQ band layout selectivity rule).

    ``windows`` needs (``key``, ``start_us``, ``end_us``); empty or
    inverted intervals are dropped (``sequence`` would otherwise count
    DOWN and fabricate buckets).
    """
    spans = windows.where(F.col("end_us") > F.col("start_us")).withColumn(
        "bucket",
        F.explode(
            F.sequence(
                F.expr(f"start_us div {int(bucket_us)}"),
                F.expr(f"(end_us - 1) div {int(bucket_us)}"),
            )
        ),
    )
    evb = events.withColumn("bucket", F.expr(f"ts_us div {int(bucket_us)}"))
    return (
        spans.join(evb, [key, "bucket"])
        .where(
            (F.col("ts_us") >= F.col("start_us"))
            & (F.col("ts_us") < F.col("end_us"))
        )
        .drop("bucket")
    )


def purchase_attribution(
    events: DataFrame, lookback_us: int = HOUR_US
) -> DataFrame:
    """Last-touch attribution: every purchase is credited with the
    user's non-purchase events in the preceding ``lookback_us`` window
    — the canonical interval-join consumer (ad attribution, incident
    correlation, feature windows for training data).

    Windows are derived per purchase as ``[ts - lookback, ts)``; the
    join is :func:`range_join`'s bucketed equi-join (buckets sized to
    the lookback, so each window explodes to at most 2 buckets).
    Purchases with no attributable events are kept at zero via the
    final left join — output is one row per purchase. Value sums
    accumulate in DECIMAL (exact, order-independent).
    """
    wins = events.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts_us").alias("purchase_ts_us"),
        (F.col("ts_us") - lookback_us).alias("start_us"),
        F.col("ts_us").alias("end_us"),
    )
    touches = events.where(F.col("event_type") != "purchase").select(
        "user_id", "ts_us", "value"
    )
    matched = range_join(touches, wins, bucket_us=lookback_us).groupBy(
        "purchase_id"
    ).agg(
        F.count("*").alias("n_attributed"),
        _sum_value_exact().alias("attributed_value"),
    )
    return (
        wins.select("purchase_id", "user_id", "purchase_ts_us")
        .join(matched, "purchase_id", "left")
        .select(
            "purchase_id",
            "user_id",
            "purchase_ts_us",
            F.coalesce(F.col("n_attributed"), F.lit(0)).cast("bigint").alias(
                "n_attributed"
            ),
            F.coalesce(F.col("attributed_value"), F.lit(0.0)).alias(
                "attributed_value"
            ),
        )
    )


def rolling_window(
    events: DataFrame, width_us: int = HOUR_US
) -> DataFrame:
    """Per-event trailing-window aggregates: for every event, the count
    and exact value sum of the same user's events in the preceding
    ``width_us`` (inclusive) — the feature-engineering shape behind
    rate limits, burst detection, and rolling user activity features.

    A RANGE frame over event time, partitioned on user_id: the shuffle
    key is the user, each partition sorts its own user's events, and
    the frame slides without re-aggregating (Spark maintains the
    running frame incrementally). The value sum accumulates in integer
    cents so the double emitted at the end is order-exact on both
    engines regardless of frame evaluation internals.
    """
    from pyspark.sql import Window

    cents = F.expr("CAST(round(value * 100) AS BIGINT)")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-width_us, 0)
    )
    return events.select(
        "user_id",
        "event_id",
        "ts_us",
        F.count("*").over(w).alias("n_events_1h"),
        (F.sum(cents).over(w) / F.lit(100.0)).alias("sum_value_1h"),
    )


DAY_US = 86_400_000_000


def retention_cohorts(events: DataFrame, day_us: int = DAY_US) -> DataFrame:
    """Cohort retention matrix — the standard activation/retention
    rollup over an event stream: users grouped by FIRST-ACTIVE day
    (their cohort), counted per (cohort_day, age_days) where age is a
    later day the user was active, in whole days since the cohort day.
    All integer arithmetic (epoch-micros div day width) — engine-exact.

    Shape: distinct (user, day) activity (one shuffle keyed on the
    pair, map-side combined), per-user min day (agg on user_id), one
    equi-join back on user_id, final count keyed (cohort, age) — every
    stage shuffles on bounded keys; no window over the raw stream, so
    a hot user costs their distinct-day count, not their event count.
    Output (cohort_start_us, age_days, n_users); ``age_days = 0`` rows
    are the cohort sizes.
    """
    act = events.select(
        "user_id", F.expr(f"ts_us div {int(day_us)}").alias("day")
    ).dropDuplicates(["user_id", "day"])
    first = act.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        act.join(first, "user_id")
        .groupBy(
            "cohort_day",
            (F.col("day") - F.col("cohort_day")).alias("age_days"),
        )
        .agg(F.count("*").alias("n_users"))
        .select(
            (F.col("cohort_day") * day_us).cast("bigint").alias(
                "cohort_start_us"
            ),
            F.col("age_days").cast("bigint").alias("age_days"),
            "n_users",
        )
    )


def rate_anomalies(events: DataFrame, width_us: int = HOUR_US) -> DataFrame:
    """Per-type event-rate anomaly windows — the monitoring rollup an
    ingest pipeline alerts on: hourly counts per event type, flagged
    where the count deviates from the type's mean by more than two
    standard deviations. The two-sigma rule is evaluated in EXACT
    integer arithmetic — ``(cnt·n − Σcnt)² > 4·(n·Σcnt² − (Σcnt)²)``
    is ``(cnt − mean)² > 4·σ²`` with both sides multiplied by ``n²`` —
    so the flag (and every output column) is bigint-exact and the
    oracle comparison cannot wobble on float rounding.

    Scale shape: one map-side-combined count shuffle keyed
    (type, window), one bounded per-type stats aggregate (rows =
    #types), broadcast back onto the counts. Sketch-sized state at any
    corpus size — the window table never sorts and the raw stream is
    touched once.
    """
    bucket = F.expr(f"ts_us div {width_us}")
    counts = (
        events.withColumn(
            "window_start_us", (bucket * width_us).cast("bigint")
        )
        .groupBy("event_type", "window_start_us")
        .agg(F.count("*").alias("n_events"))
    )
    return anomaly_flag(counts)


def anomaly_flag(counts: DataFrame) -> DataFrame:
    """Two-sigma evaluation over a (event_type, window_start_us,
    n_events) counts relation — the stateless half of
    :func:`rate_anomalies`, shared verbatim by its streaming twin
    (`streaming.windows.streaming_rate_anomalies` applies it to the
    drained stream counts), so batch and stream cannot drift."""
    stats = counts.groupBy("event_type").agg(
        F.count("*").alias("n_windows"),
        F.sum("n_events").alias("sum_cnt"),
        F.sum(F.col("n_events") * F.col("n_events")).alias("sum_sq"),
    )
    j = counts.join(F.broadcast(stats), "event_type")
    dev = F.col("n_events") * F.col("n_windows") - F.col("sum_cnt")
    var4 = F.lit(4) * (
        F.col("n_windows") * F.col("sum_sq")
        - F.col("sum_cnt") * F.col("sum_cnt")
    )
    return j.where(dev * dev > var4).select(
        "event_type",
        "window_start_us",
        "n_events",
        "n_windows",
        "sum_cnt",
        (dev * dev).cast("bigint").alias("dev_sq"),
        var4.cast("bigint").alias("var4"),
    )
