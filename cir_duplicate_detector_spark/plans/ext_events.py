"""Event-stream extension queries: windows, sessionize,
funnel, as-of join, retention, attribution, quantiles,
anomaly detection, watermarked dedup (batch + streaming
twins).

Split out of the monolithic ``extension_queries.py`` (round-10
modularity; VERDICT r9 item 6) with NO behavior change: same
callables, same oracle strings, same registry names.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from ..operators import events
from ..sources.tables import load_table
from ..streaming.windows import streaming_tumbling_window


def q_events_window(spark, sf_dir):
    return events.tumbling_window(load_table(spark, sf_dir, "events"))


SQL_EVENTS_WINDOW = f"""
SELECT (epoch_us(ts) // {events.HOUR_US}) * {events.HOUR_US} AS window_start_us,
       event_type,
       count(*) AS n_events,
       cast(sum(value::DECIMAL(18,2)) as double) AS sum_value
FROM events GROUP BY 1, 2
"""


def q_events_window_streaming(spark, sf_dir):
    return streaming_tumbling_window(spark, sf_dir)


def q_events_sessionize(spark, sf_dir):
    return events.sessionize(load_table(spark, sf_dir, "events"))


SQL_EVENTS_SESSIONIZE = f"""
WITH e AS (
  SELECT user_id, event_id, value, epoch_us(ts) AS ts_us FROM events
),
b AS (
  SELECT *, CASE WHEN ts_us - lag(ts_us) OVER w > {events.SESSION_GAP_US}
                 THEN 1 ELSE 0 END AS boundary
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
),
s AS (
  SELECT *, sum(boundary) OVER (
    PARTITION BY user_id ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING
  )::BIGINT AS session_id FROM b
)
SELECT user_id, session_id,
       min(ts_us) AS session_start_us,
       max(ts_us) AS session_end_us,
       count(*) AS n_events,
       cast(sum(value::DECIMAL(18,2)) as double) AS sum_value
FROM s GROUP BY user_id, session_id
"""


def q_events_funnel(spark, sf_dir):
    """Staged conversion funnel view → click → purchase: a user reaches
    stage N when an event of that type occurs AT OR AFTER their stage
    N-1 entry time (first-touch semantics via conditional MIN chains).
    Three user-keyed aggregates and two user-keyed equi-joins: every
    shuffle is on user_id, so the stages co-partition and the join
    after the first agg is exchange-free on a cluster that reuses the
    partitioning. The analytic shape (ordered event progression) that
    SQL MATCH_RECOGNIZE engines special-case, expressed in plain
    relational algebra both engines execute identically."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts_us"
    )
    v = (
        ev.where("event_type = 'view'")
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("v_ts"))
    )
    c = (
        ev.where("event_type = 'click'")
        .join(v, "user_id")
        .where(F.col("ts_us") >= F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("c_ts"))
    )
    p = (
        ev.where("event_type = 'purchase'")
        .join(c, "user_id")
        .where(F.col("ts_us") >= F.col("c_ts"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("p_ts"))
    )
    staged = (
        v.select(F.lit("1_view").alias("stage"), "user_id")
        .unionAll(c.select(F.lit("2_click").alias("stage"), "user_id"))
        .unionAll(p.select(F.lit("3_purchase").alias("stage"), "user_id"))
    )
    return staged.groupBy("stage").agg(F.count("*").alias("n_users"))


SQL_EVENTS_FUNNEL = """
WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
v AS (
  SELECT user_id, min(ts_us) AS v_ts FROM e
  WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, min(e.ts_us) AS c_ts
  FROM e JOIN v USING (user_id)
  WHERE e.event_type = 'click' AND e.ts_us >= v.v_ts
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, min(e.ts_us) AS p_ts
  FROM e JOIN c USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts_us >= c.c_ts
  GROUP BY e.user_id
),
st AS (
  SELECT '1_view' AS stage, user_id FROM v
  UNION ALL SELECT '2_click', user_id FROM c
  UNION ALL SELECT '3_purchase', user_id FROM p
)
SELECT stage, count(*) AS n_users FROM st GROUP BY stage
"""


def q_events_json(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("bigint").alias("k_val"),
    )


SQL_EVENTS_JSON = """
SELECT event_id, event_type, json_extract_string(props, '$.k')::BIGINT AS k_val
FROM events
"""


def q_events_asof(spark, sf_dir):
    """As-of (backward) join within the event stream: each click is
    annotated with the user's most recent prior purchase — expressed as
    an ignore-nulls running last_value in one window pass, the
    shuffle-minimal Spark formulation of an as-of join against the same
    stream.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    last_purchase = F.last(
        F.when(F.col("event_type") == "purchase", F.col("ts_us")),
        ignorenulls=True,
    ).over(w)
    return (
        ev.withColumn("last_purchase_ts_us", last_purchase)
        .where(F.col("event_type") == "click")
        .select(
            "user_id",
            "event_id",
            "ts_us",
            "last_purchase_ts_us",
            (F.col("ts_us") - F.col("last_purchase_ts_us")).alias(
                "since_purchase_us"
            ),
        )
    )


SQL_EVENTS_ASOF = """
SELECT user_id, event_id, ts_us, last_purchase_ts_us,
       ts_us - last_purchase_ts_us AS since_purchase_us
FROM (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
         last_value(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                 ROWS UNBOUNDED PRECEDING) AS last_purchase_ts_us
  FROM events
)
WHERE event_type = 'click'
"""


def q_events_sessionize_stateful(spark, sf_dir):
    from ..streaming.stateful import streaming_sessionize

    return streaming_sessionize(spark, sf_dir)


def q_events_distinct_users(spark, sf_dir):
    """Exact distinct aggregation (expands to a two-phase plan)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count("*").alias("n_events"),
    )


SQL_EVENTS_DISTINCT_USERS = """
SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
FROM events GROUP BY event_type
"""


def q_events_distinct_users_streaming(spark, sf_dir):
    from ..streaming.windows import streaming_distinct_users

    return streaming_distinct_users(spark, sf_dir)


SQL_EVENTS_DISTINCT_USERS_STREAMING = """
SELECT event_type, count(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type
"""


def q_events_quantiles(spark, sf_dir):
    """Exact linear-interpolation percentiles per event type, computed
    from EXPLICIT rank selection so the interpolation arithmetic is one
    shared formula on both engines: ``v_lo + (v_hi − v_lo) · g`` with
    ``pos = p·(n−1)``, ``g = pos − floor(pos)``.

    Round 13: the 10×-replica parity gate caught the built-ins
    diverging in the last ulp — Spark's ``percentile`` interpolates
    ``a·(1−g) + b·g`` while DuckDB's ``quantile_cont`` lerps
    ``a + (b−a)·g``; identical real numbers, different doubles exactly
    when the quantile position crosses a value boundary (the
    replicated corpus's 10-copy runs manufacture that alignment:
    a=230.52, b=230.54, g=0.5 → 230.53 vs 230.53000000000003). Both
    sides now spell out the lerp form over rank-selected bracket
    values. Scale bonus: Spark's exact ``percentile`` agg buffers
    every value of a group in executor memory — the rank window is
    sort-based and spillable, the shape that survives 100 TB
    (``percentile_approx`` remains the at-scale variant; it has no
    exact oracle, so the registered query is the exact form)."""
    from pyspark.sql import Window

    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .select("event_type", F.col("value").cast("double").alias("v"))
    )
    w = Window.partitionBy("event_type").orderBy("v")
    ranked = ev.select(
        "event_type",
        "v",
        (F.row_number().over(w) - 1).alias("rn"),
        F.count("*").over(Window.partitionBy("event_type")).alias("n"),
    )

    def q(p, name):
        pos = F.lit(p) * (F.col("n") - 1)
        lo, hi = F.floor(pos), F.ceil(pos)
        g = pos - F.floor(pos)
        v_lo = F.max(F.when(F.col("rn") == lo, F.col("v")))
        v_hi = F.max(F.when(F.col("rn") == hi, F.col("v")))
        # g is constant within a group (n is); max() picks that value.
        g_agg = F.max(g)
        return (v_lo + (v_hi - v_lo) * g_agg).alias(name)

    return ranked.groupBy("event_type").agg(
        q(0.5, "p50"),
        q(0.9, "p90"),
        q(0.99, "p99"),
        F.min("v").alias("v_min"),
        F.max("v").alias("v_max"),
    )


SQL_EVENTS_QUANTILES = """
WITH r AS (
  SELECT event_type, value::DOUBLE AS v,
         row_number() OVER (PARTITION BY event_type ORDER BY value)
           - 1 AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events WHERE value IS NOT NULL
)
SELECT event_type,
       max(CASE WHEN rn = floor(0.5::DOUBLE * (n - 1)) THEN v END)
         + (max(CASE WHEN rn = ceil(0.5::DOUBLE * (n - 1)) THEN v END)
            - max(CASE WHEN rn = floor(0.5::DOUBLE * (n - 1)) THEN v END))
           * max(0.5::DOUBLE * (n - 1) - floor(0.5::DOUBLE * (n - 1))) AS p50,
       max(CASE WHEN rn = floor(0.9::DOUBLE * (n - 1)) THEN v END)
         + (max(CASE WHEN rn = ceil(0.9::DOUBLE * (n - 1)) THEN v END)
            - max(CASE WHEN rn = floor(0.9::DOUBLE * (n - 1)) THEN v END))
           * max(0.9::DOUBLE * (n - 1) - floor(0.9::DOUBLE * (n - 1))) AS p90,
       max(CASE WHEN rn = floor(0.99::DOUBLE * (n - 1)) THEN v END)
         + (max(CASE WHEN rn = ceil(0.99::DOUBLE * (n - 1)) THEN v END)
            - max(CASE WHEN rn = floor(0.99::DOUBLE * (n - 1)) THEN v END))
           * max(0.99::DOUBLE * (n - 1) - floor(0.99::DOUBLE * (n - 1))) AS p99,
       min(v) AS v_min,
       max(v) AS v_max
FROM r GROUP BY event_type
"""


def q_events_attribution(spark, sf_dir):
    return events.purchase_attribution(load_table(spark, sf_dir, "events"))


def q_events_attribution_streaming(spark, sf_dir):
    from ..streaming.windows import streaming_purchase_attribution

    return streaming_purchase_attribution(spark, sf_dir)


SQL_EVENTS_ATTRIBUTION = """
WITH ev AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us, value
  FROM events
),
p AS (
  SELECT event_id AS purchase_id, user_id, ts_us AS purchase_ts_us FROM ev
  WHERE event_type = 'purchase'
),
m AS (
  SELECT p.purchase_id,
         count(*)::BIGINT AS n_attributed,
         sum(e.value::DECIMAL(18,2))::DOUBLE AS attributed_value
  FROM p JOIN ev e
    ON e.user_id = p.user_id AND e.event_type <> 'purchase'
   AND e.ts_us >= p.purchase_ts_us - 3600000000
   AND e.ts_us < p.purchase_ts_us
  GROUP BY p.purchase_id
)
SELECT p.purchase_id, p.user_id, p.purchase_ts_us,
       coalesce(m.n_attributed, 0)::BIGINT AS n_attributed,
       coalesce(m.attributed_value, 0.0)::DOUBLE AS attributed_value
FROM p LEFT JOIN m USING (purchase_id)
"""


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_events_pivot(spark, sf_dir):
    """Wide-format user activity matrix: one row per user, one count
    column per event type — the pivot operator. The value list is
    EXPLICIT (``pivot(col, values)``): without it Spark runs an eager
    distinct scan to discover the columns and the output schema becomes
    data-dependent — both wrong at 100 TB, where the type vocabulary is
    a declared contract. Physical shape: the pivot compiles to one hash
    aggregation with per-type conditional counts (same plan as the
    manual CASE form the oracle spells out) — map-side partial, one
    shuffle on user_id."""
    ev = load_table(spark, sf_dir, "events")
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))
    )
    return out.select(
        "user_id",
        *[
            F.coalesce(F.col(t), F.lit(0)).cast("bigint").alias(f"n_{t}")
            for t in EVENT_TYPES
        ],
    )


SQL_EVENTS_PIVOT = f"""
SELECT user_id,
       {", ".join(
           f"sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END)::BIGINT"
           f" AS n_{t}" for t in EVENT_TYPES
       )}
FROM events GROUP BY user_id
"""


def q_events_rolling(spark, sf_dir):
    """Trailing 1h per-user rolling count/sum (RANGE frame)."""
    return events.rolling_window(load_table(spark, sf_dir, "events"))


SQL_EVENTS_ROLLING = f"""
SELECT user_id, event_id, epoch_us(ts) AS ts_us,
       count(*) OVER w AS n_events_1h,
       sum(CAST(round(value * 100) AS BIGINT)) OVER w / 100.0 AS sum_value_1h
FROM events
WINDOW w AS (
  PARTITION BY user_id ORDER BY epoch_us(ts)
  RANGE BETWEEN {events.HOUR_US} PRECEDING AND CURRENT ROW
)
"""


def q_events_retention(spark, sf_dir):
    """Cohort retention matrix (`events.retention_cohorts`): users
    bucketed by first-active day, counted per (cohort, whole-day age)
    they were active again — integer-exact day arithmetic, shuffles on
    bounded keys (user/day pairs, then cohort/age), never a window over
    the raw stream."""
    return events.retention_cohorts(load_table(spark, sf_dir, "events"))


SQL_EVENTS_RETENTION = f"""
WITH act AS (
  SELECT DISTINCT user_id, epoch_us(ts) // {events.DAY_US} AS day FROM events
),
first AS (SELECT user_id, min(day) AS cohort_day FROM act GROUP BY 1)
SELECT (f.cohort_day * {events.DAY_US})::BIGINT AS cohort_start_us,
       (a.day - f.cohort_day)::BIGINT AS age_days,
       count(*)::BIGINT AS n_users
FROM act a JOIN first f USING (user_id)
GROUP BY 1, 2
"""


def q_events_quantiles_hist(spark, sf_dir):
    from ..operators.sketches import histogram_quantiles

    return histogram_quantiles(load_table(spark, sf_dir, "events"))


SQL_EVENTS_QUANTILES_HIST = """
WITH ev AS (
  SELECT event_type, value FROM events WHERE value IS NOT NULL
),
stats AS (
  SELECT event_type, min(value) AS v_min, max(value) AS v_max,
         count(*)::BIGINT AS n
  FROM ev GROUP BY event_type
),
bucketed AS (
  SELECT ev.event_type, stats.v_min, stats.v_max, stats.n,
         -- width-zero guard, matching the operator (subnormal ranges
         -- underflow (v_max - v_min)/64 to exactly 0.0 with min < max)
         CASE WHEN (stats.v_max - stats.v_min) / 64.0 = 0 THEN 0
              ELSE least(
                floor((ev.value - stats.v_min)
                      / ((stats.v_max - stats.v_min) / 64.0))::BIGINT,
                63)
         END AS bucket
  FROM ev, stats WHERE ev.event_type = stats.event_type
),
counts AS (
  SELECT event_type, v_min, v_max, n, bucket, count(*)::BIGINT AS cnt
  FROM bucketed GROUP BY 1, 2, 3, 4, 5
),
cum AS (
  SELECT *, sum(cnt) OVER (
    PARTITION BY event_type ORDER BY bucket
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  ) AS cum
  FROM counts
)
SELECT event_type, min(n) AS n,
       CASE WHEN min(v_max) = min(v_min) THEN min(v_min)
            ELSE min(v_min)
                 + CAST(min(CASE WHEN cum >= (n * 50 + 99) // 100
                                 THEN bucket END) + 1 AS DOUBLE)
                   * ((min(v_max) - min(v_min)) / 64.0)
       END AS est_p50,
       CASE WHEN min(v_max) = min(v_min) THEN min(v_min)
            ELSE min(v_min)
                 + CAST(min(CASE WHEN cum >= (n * 90 + 99) // 100
                                 THEN bucket END) + 1 AS DOUBLE)
                   * ((min(v_max) - min(v_min)) / 64.0)
       END AS est_p90,
       CASE WHEN min(v_max) = min(v_min) THEN min(v_min)
            ELSE min(v_min)
                 + CAST(min(CASE WHEN cum >= (n * 99 + 99) // 100
                                 THEN bucket END) + 1 AS DOUBLE)
                   * ((min(v_max) - min(v_min)) / 64.0)
       END AS est_p99
FROM cum GROUP BY event_type
"""


def q_events_dedup_watermarked(spark, sf_dir):
    from ..streaming.windows import streaming_dedup_watermarked

    return streaming_dedup_watermarked(spark, sf_dir)


SQL_EVENTS_DEDUP_WATERMARKED = """
WITH deliveries AS (
  SELECT event_id, event_type FROM events
  UNION ALL
  SELECT event_id, event_type FROM events WHERE event_id % 7 = 0
)
SELECT event_type, count(DISTINCT event_id) AS n_events
FROM deliveries GROUP BY event_type
"""


def q_events_anomaly(spark, sf_dir):
    """Per-type event-rate anomaly windows (`events.rate_anomalies`):
    hourly counts per type flagged beyond two standard deviations,
    with the two-sigma rule evaluated in EXACT integer arithmetic
    ((cnt·n − Σ)² > 4·(n·Σsq − Σ²) — both sides of the float rule
    multiplied by n²) so the flag cannot wobble on rounding. One
    count shuffle + one #types-row stats broadcast."""
    return events.rate_anomalies(load_table(spark, sf_dir, "events"))


SQL_EVENTS_ANOMALY = f"""
WITH c AS (
  SELECT event_type,
         (epoch_us(ts) // {events.HOUR_US}) * {events.HOUR_US}
           AS window_start_us,
         count(*)::BIGINT AS n_events
  FROM events GROUP BY 1, 2
),
s AS (
  SELECT event_type, count(*)::BIGINT AS n_windows,
         sum(n_events)::BIGINT AS sum_cnt,
         sum(n_events * n_events)::BIGINT AS sum_sq
  FROM c GROUP BY 1
)
SELECT c.event_type, c.window_start_us, c.n_events, s.n_windows, s.sum_cnt,
       ((c.n_events * s.n_windows - s.sum_cnt)
        * (c.n_events * s.n_windows - s.sum_cnt))::BIGINT AS dev_sq,
       (4 * (s.n_windows * s.sum_sq - s.sum_cnt * s.sum_cnt))::BIGINT
         AS var4
FROM c JOIN s USING (event_type)
WHERE (c.n_events * s.n_windows - s.sum_cnt)
      * (c.n_events * s.n_windows - s.sum_cnt)
      > 4 * (s.n_windows * s.sum_sq - s.sum_cnt * s.sum_cnt)
"""


def q_events_anomaly_streaming(spark, sf_dir):
    """Streaming twin of `events_anomaly`
    (`streaming.windows.streaming_rate_anomalies`): event-time windowed
    counts accumulate in complete-mode streaming state (watermark 1 h);
    the per-type two-sigma baseline is the slower-moving batch-side
    state, applied to the drained counts through the SHARED
    `events.anomaly_flag` code path — one oracle string with the batch
    twin by the registry guard."""
    from ..streaming.windows import streaming_rate_anomalies

    return streaming_rate_anomalies(spark, sf_dir)


EVENTS_QUERIES: dict[str, tuple] = {
    "events_anomaly": (q_events_anomaly, SQL_EVENTS_ANOMALY),
    "events_anomaly_streaming": (
        q_events_anomaly_streaming,
        SQL_EVENTS_ANOMALY,
    ),
    "events_window": (q_events_window, SQL_EVENTS_WINDOW),
    "events_window_streaming": (q_events_window_streaming, SQL_EVENTS_WINDOW),
    "events_sessionize": (q_events_sessionize, SQL_EVENTS_SESSIONIZE),
    "events_sessionize_stateful": (
        q_events_sessionize_stateful,
        SQL_EVENTS_SESSIONIZE,
    ),
    "events_asof": (q_events_asof, SQL_EVENTS_ASOF),
    "events_json": (q_events_json, SQL_EVENTS_JSON),
    "events_funnel": (q_events_funnel, SQL_EVENTS_FUNNEL),
    "events_distinct_users": (q_events_distinct_users, SQL_EVENTS_DISTINCT_USERS),
    "events_distinct_users_streaming": (
        q_events_distinct_users_streaming,
        SQL_EVENTS_DISTINCT_USERS_STREAMING,
    ),
    "events_quantiles": (q_events_quantiles, SQL_EVENTS_QUANTILES),
    "events_attribution": (q_events_attribution, SQL_EVENTS_ATTRIBUTION),
    "events_attribution_streaming": (
        q_events_attribution_streaming,
        SQL_EVENTS_ATTRIBUTION,
    ),
    "events_quantiles_hist": (
        q_events_quantiles_hist,
        SQL_EVENTS_QUANTILES_HIST,
    ),
    "events_dedup_watermarked": (
        q_events_dedup_watermarked,
        SQL_EVENTS_DEDUP_WATERMARKED,
    ),
    "events_rolling": (q_events_rolling, SQL_EVENTS_ROLLING),
    "events_retention": (q_events_retention, SQL_EVENTS_RETENTION),
    "events_pivot": (q_events_pivot, SQL_EVENTS_PIVOT),
}
