"""Distinct-count sketching: KMV (k-minimum-values) estimator.

The classic bottom-k sketch (Bar-Yossef et al., "Counting distinct
elements in a data stream"): keep the k smallest hash values of the
distinct items; if the k-th smallest normalized hash is U, the distinct
count is ≈ (k-1)/U. Unlike HyperLogLog (whose register layout is
engine-private — Spark's `approx_count_distinct` and DuckDB's
`approx_count_distinct` disagree by construction), KMV over a
deterministic hash is REPRODUCIBLE on any engine: same hash family →
same bottom-k → same estimate, bit for bit. That is what makes it
oracle-checkable, and it is also what makes sketches mergeable across
partitions/days in a real pipeline (union the bottom-k sets, re-take
the bottom k).

Physical shape at 100 TB: the explode never leaves the map side — the
(group, hash) distinct is a partial-aggregated groupBy (map-side
combine collapses duplicate tokens before the shuffle) — and the
bottom-k itself is TWO-PHASE, exploiting the sketch's mergeability:
salt buckets each keep a local bottom-k (parallel, bounded output),
then the union of locals (≤ S·k rows per group) takes the exact global
bottom-k. A group's full distinct vocabulary is never sorted by one
task. Output is one row per group. No driver-side state, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.text import hash60, tokens

KMV_K = 64

# Phase-1 salt width for the two-phase bottom-k: each group's distinct
# hashes spread over this many parallel local-bottom-k aggregations.
KMV_SALT_BUCKETS = 64

# 2^60: the hash60 family is uniform on [0, 2^60). Exactly representable
# as a double, so (k-1) * HASH_SPACE is one exact product and the
# estimate is a single IEEE division — identical on Spark and DuckDB.
HASH_SPACE = float(1 << 60)


def kmv_distinct(
    items: DataFrame,
    group: str,
    value: str,
    k: int = KMV_K,
) -> DataFrame:
    """Per-group KMV distinct-count estimate over ``items[value]``.

    Returns ``(group, n_kept, kth_hash, est_distinct)``:

    * ``n_kept``  — bottom-k set size (= exact distinct count when the
      group has fewer than k distinct values — the estimator is EXACT
      below k, which is the sketch's small-group guarantee);
    * ``kth_hash`` — the largest retained hash (the sketch boundary);
    * ``est_distinct`` — (k-1) · 2^60 / kth_hash, or the exact count
      when the group is below k.

    Bottom-k runs in two phases (a per-group global sort would put a
    whole group's distinct vocabulary on ONE task at 100 TB):

    1. salt by ``h % KMV_SALT_BUCKETS``: a ``row_number`` window over
       each (group, salt) bucket keeps only its LOCAL bottom-k — S
       parallel partitions per group, ≤ S·k surviving rows. A window,
       NOT a ``collect_list`` aggregation, deliberately: WindowExec
       buffers each partition in a spillable external row array, so
       per-task memory stays bounded even when one bucket holds
       ~1/S of a 10¹⁰-hash vocabulary; an aggregation buffer holding
       the bucket's whole hash set would be resident in one task's
       heap before the sort/slice (round-4 advice).
    2. exact global bottom-k over the survivors via a per-group
       window that now sorts ≤ S·k rows.

    Phase 1 is lossless: any hash in the global bottom-k has < k
    hashes below it overall, hence < k in its own bucket, so it
    survives its bucket's local bottom-k. (This merge is the same
    union-then-retake operation that makes KMV sketches composable
    across days/shards.)
    """
    # distinct() compiles to a partial HashAggregate on (group, h):
    # duplicate tokens collapse map-side before the shuffle.
    hashed = items.select(
        F.col(group), hash60(F.col(value), seed="kmv").alias("h")
    ).distinct()
    w_local = Window.partitionBy(
        group, (F.col("h") % KMV_SALT_BUCKETS)
    ).orderBy("h")
    merged = (
        hashed.withColumn("_lrn", F.row_number().over(w_local))
        .where(F.col("_lrn") <= k)
        .select(group, "h")
    )
    w = Window.partitionBy(group).orderBy("h")
    bottom = (
        merged.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
    )
    return bottom.groupBy(group).agg(
        F.count("*").cast("bigint").alias("n_kept"),
        F.max("h").alias("kth_hash"),
    ).select(
        group,
        "n_kept",
        "kth_hash",
        F.when(F.col("n_kept") < k, F.col("n_kept").cast("double"))
        .otherwise(
            F.lit(float(k - 1) * HASH_SPACE) / F.col("kth_hash").cast("double")
        )
        .alias("est_distinct"),
    )


def kmv_distinct_tokens(
    docs: DataFrame, k: int = KMV_K, group: str = "lang"
) -> DataFrame:
    """Distinct-VOCABULARY estimate per language: KMV over whitespace
    tokens. The explode feeds straight into the partial-aggregated
    distinct, so the full token stream never crosses a shuffle — only
    the per-partition distinct (group, hash) pairs do.
    """
    toks = docs.select(group, F.explode(tokens("text")).alias("tok"))
    return kmv_distinct(toks, group, "tok", k)


# ------------------------------------------------- Count-Min sketch

CMS_DEPTH = 4
CMS_WIDTH = 512


def cms_sketch(
    items: DataFrame,
    value: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    weight: str | None = None,
) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan) of the ``value``
    occurrence stream: ``depth × width`` counters, cell ``(r, c)``
    counting items whose r-seeded hash lands on column c. Returns the
    counter table ``(row, col, cnt)`` — at most ``depth·width`` rows
    REGARDLESS of stream size, the bounded-memory frequency summary
    that merges across partitions/shards/days by cell-wise addition
    (same mergeability argument as the KMV sketch above, and the same
    reason this is reproducible cross-engine where any engine-private
    sketch register layout is not).

    One explode(depth) + map-side-combined groupBy: duplicate cells
    collapse to ``depth·width`` partial counters per task before the
    shuffle, so the shuffle moves O(depth·width·tasks) rows, not the
    stream.
    """
    seed = F.concat(F.lit("cms"), F.col("row").cast("string"))
    cols = [F.col(value).alias("v")] + (
        [F.col(weight).alias("w")] if weight else []
    )
    agg = F.sum("w") if weight else F.count("*")
    return (
        items.select(*cols)
        .select(
            F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row"),
            *[c for c in ("v", "w") if weight or c == "v"],
        )
        .select(
            "row",
            (hash60(F.col("v"), seed=seed) % width).alias("col"),
            *(["w"] if weight else []),
        )
        .groupBy("row", "col")
        .agg(agg.cast("bigint").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    candidates: DataFrame,
    value: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point-query the sketch for each candidate: the estimate is the
    MIN over the candidate's ``depth`` counter cells (each cell
    overcounts by colliding items, never undercounts — the one-sided
    CMS guarantee). The sketch side is broadcast — ≤ depth·width rows
    by construction, safe at any corpus size.

    The sketch stores only TOUCHED cells, so the probe joins LEFT and
    an absent cell reads as 0 — a candidate the stream never saw (and
    whose cells nothing collided into) correctly estimates 0 instead
    of vanishing from the output, and one empty cell among a
    candidate's ``depth`` cells correctly pins the min at 0.
    """
    seed = F.concat(F.lit("cms"), F.col("row").cast("string"))
    probes = candidates.select(F.col(value).alias("cand_v")).select(
        "cand_v",
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row"),
    ).select(
        "cand_v",
        "row",
        (hash60(F.col("cand_v"), seed=seed) % width).alias("col"),
    )
    return (
        probes.join(F.broadcast(sketch), ["row", "col"], "left")
        .groupBy("cand_v")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_cnt"))
        .select(F.col("cand_v").alias(value), "est_cnt")
    )


def cms_topk_diagnostic(docs: DataFrame, k: int = 20) -> DataFrame:
    """Self-measuring CMS quality check (the heavy-hitters analogue of
    ``ann_recall_lsh``): the exact top-k tokens by corpus frequency,
    each with its Count-Min estimate alongside the truth. ``est_cnt >=
    true_cnt`` always (one-sided error); the gap measures collision
    noise at the configured depth×width. Ties at rank k break
    deterministically on the token string.
    """
    from ..cache import materialize

    toks = docs.select(F.explode(tokens("text")).alias("tok"))
    # Materialized: feeds BOTH the top-k truth and the sketch build —
    # without it the tokenize+explode scan runs twice (uncached
    # subplans). The sketch derives from the per-token counts as
    # WEIGHTED cell sums, which is cell-for-cell identical to counting
    # raw occurrences (addition is associative across equal tokens)
    # and avoids re-exploding the occurrence stream.
    true_counts = materialize(
        toks.groupBy("tok").agg(
            F.count("*").cast("bigint").alias("true_cnt")
        )
    )
    # Two-phase top-k (same argument as the KMV bottom-k above): a
    # bare global rank window would sort the WHOLE distinct vocabulary
    # on one task. Salted local top-k first bounds the global window's
    # input to ≤ S·k rows; lossless because a global top-k row is top-k
    # within its own bucket a fortiori.
    w_local = Window.partitionBy(F.col("tok_salt")).orderBy(
        F.col("true_cnt").desc(), F.col("tok")
    )
    survivors = (
        true_counts.withColumn("tok_salt", hash60("tok", seed="cmstop") % 64)
        .withColumn("_lrn", F.row_number().over(w_local))
        .where(F.col("_lrn") <= k)
        .select("tok", "true_cnt")
    )
    w = Window.orderBy(F.col("true_cnt").desc(), F.col("tok"))
    top = (
        survivors.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
    )
    est = cms_estimate(
        cms_sketch(true_counts, "tok", weight="true_cnt"), top, "tok"
    )
    return top.join(est, "tok").select("tok", "rank", "true_cnt", "est_cnt")


HIST_BINS = 64


def histogram_quantiles(
    events: DataFrame,
    group: str = "event_type",
    value: str = "value",
    nbins: int = HIST_BINS,
    percents: tuple[int, ...] = (50, 90, 99),
) -> DataFrame:
    """Fixed-grid histogram quantile sketch: the mergeable, bounded-
    state estimator that replaces an exact per-group sort at scale.

    Exact percentiles (`events_quantiles`) need every value of a group
    in one sorted run; at 100 TB that is the one shape that cannot
    partial-aggregate. The histogram sketch keeps ``nbins`` counters
    per group — counters are cell-wise mergeable across partitions,
    days, and clusters (like the KMV / Count-Min sketches above), the
    per-group state is O(nbins) regardless of row count, and the whole
    aggregation partial-combines map-side. The estimate returned for
    percentile p is the UPPER EDGE of the first bucket whose cumulative
    count reaches ceil(n·p/100) — a one-sided (≥ the exact percentile)
    estimate with error bounded by one bucket width, i.e. (max-min)/nbins.

    Engine-reproducible by construction: bucket index is one subtract +
    one IEEE division + floor (bit-identical on Spark and DuckDB), rank
    thresholds are exact integer ceil-division, and the bucket edge is
    one fused multiply-free expression ``v_min + (b+1)·width`` evaluated
    in the same order on both engines. Degenerate groups (min == max)
    short-circuit to the exact value.

    This build derives the grid from a first min/max pass (two jobs over
    the scan); a production pipeline fixes the grid a priori (known
    metric ranges) and runs ONE pass — the sketch itself is the second
    half, unchanged.
    """
    ev = events.select(group, value).where(F.col(value).isNotNull())
    stats = ev.groupBy(group).agg(
        F.min(value).alias("v_min"),
        F.max(value).alias("v_max"),
        F.count("*").alias("n"),
    )
    width = (F.col("v_max") - F.col("v_min")) / F.lit(float(nbins))
    # Guard on the WIDTH, not min == max: a subnormal (v_max - v_min)
    # can underflow to width == 0.0 with min < max, and ANSI mode makes
    # the bucket division a hard error rather than IEEE inf
    # (hypothesis-found). width == 0 collapses every row to bucket 0,
    # so the estimate degrades to v_min with a ~0 error bound — exactly
    # what a zero-width grid means.
    degenerate = width == F.lit(0.0)
    bucket = F.when(degenerate, F.lit(0)).otherwise(
        F.least(
            F.floor((F.col(value) - F.col("v_min")) / width).cast("long"),
            F.lit(nbins - 1),
        )
    )
    counts = (
        ev.join(F.broadcast(stats), group)
        .withColumn("bucket", bucket)
        .groupBy(group, "v_min", "v_max", "n", "bucket")
        .agg(F.count("*").alias("cnt"))
    )
    wcum = (
        Window.partitionBy(group)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = counts.withColumn("cum", F.sum("cnt").over(wcum))
    est_cols = []
    for p in percents:
        thr = F.expr(f"(n * {p} + 99) div 100")
        hit_bucket = F.min(F.when(F.col("cum") >= thr, F.col("bucket")))
        est = F.when(
            F.min("v_max") == F.min("v_min"), F.min("v_min")
        ).otherwise(
            F.min("v_min")
            + (hit_bucket + 1).cast("double")
            * ((F.min("v_max") - F.min("v_min")) / F.lit(float(nbins)))
        )
        est_cols.append(est.alias(f"est_p{p}"))
    return cum.groupBy(group).agg(F.min("n").alias("n"), *est_cols)
