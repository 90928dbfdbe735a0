"""Structured Streaming twins of the batch event operators.

The tumbling-window aggregation runs as a real streaming query —
file-source ``readStream`` → event-time window with watermark →
memory sink — driven to completion with an availableNow trigger, so a
batch caller gets back an ordinary DataFrame whose contents match the
batch operator (and the same DuckDB oracle) exactly.

On a live cluster the same plan runs continuously: swap the trigger for
a processing-time one and the memory sink for kafka/delta; the watermark
(1 hour) bounds state for late data.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.events import HOUR_US
from ..sources.tables import with_event_time



def stage_source(path: str, prefix: str, name: str | None = None) -> str:
    """Stage a parquet source for the file-stream source (which needs a
    DIRECTORY of data files): symlink the single file, or — when the
    source is itself a directory of part files (replica corpora, real
    table directories) — symlink each data file. Zero-copy either way.
    ``name`` sets the staged file-name stem (the stateful harness needs
    data files to list lexically before its sentinel files)."""
    stage = tempfile.mkdtemp(prefix=prefix)
    stem = name or os.path.splitext(os.path.basename(path))[0]
    if os.path.isdir(path):
        n = 0
        for f in sorted(os.listdir(path)):
            if f.endswith(".parquet"):
                os.symlink(
                    os.path.join(path, f),
                    os.path.join(stage, f"{stem}_{n:05d}.parquet"),
                )
                n += 1
        if n == 0:
            raise FileNotFoundError(f"no parquet part files under {path}")
    else:
        os.symlink(path, os.path.join(stage, f"{stem}.parquet"))
    return stage


def streaming_tumbling_window(
    spark: SparkSession, sf_dir: str, width_us: int = HOUR_US
) -> DataFrame:
    """Run the tumbling-window aggregation as a streaming query over the
    events parquet and return the final result table.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = f"{sf_dir}/events.parquet"
    schema = spark.read.parquet(path).schema
    # The file stream source requires a DIRECTORY; stage the single
    # parquet file into a temp dir via symlink (zero-copy).
    stage = stage_source(path, "events_stream_")
    stream = (
        spark.readStream.schema(schema)
        .parquet(stage)
    )
    stream = with_event_time(stream)
    seconds = width_us // 1_000_000
    agg = (
        stream.withWatermark("ts_ts", "1 hour")
        .groupBy(F.window("ts_ts", f"{seconds} seconds"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.unix_micros(F.col("window.start")).alias("window_start_us"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    name = f"stream_win_{uuid.uuid4().hex[:8]}"
    query = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table(name)


def streaming_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact-distinct: per-type distinct user counts computed
    on a stream.

    Distinct aggregates are unsupported in Structured Streaming, so this
    uses the canonical decomposition: keyed ``dropDuplicates`` state on
    ``(event_type, user_id)`` feeding a running count in complete mode.
    State is one entry per distinct key — the bounded-state shape; a
    live pipeline would add a watermark via ``dropDuplicatesWithinWatermark``
    to expire keys (the drain job here sees bounded input instead).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = f"{sf_dir}/events.parquet"
    schema = spark.read.parquet(path).schema
    stage = stage_source(path, "events_distinct_")
    counts = (
        spark.readStream.schema(schema)
        .parquet(stage)
        .select("event_type", "user_id")
        .dropDuplicates(["event_type", "user_id"])
        .groupBy("event_type")
        .agg(F.count("*").alias("n_users"))
    )
    name = f"stream_distinct_{uuid.uuid4().hex[:8]}"
    query = (
        counts.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table(name)


def _stream_near_dup_corpus(
    spark: SparkSession, sf_dir: str, prefix: str
) -> DataFrame:
    """File-stream over the documents parquet with the derived
    near-dup corpus branches (original / truncation mutant / exact
    copy) applied STREAM-SIDE — the same expressions as
    ``sources.derived.near_dup_corpus_sql``, kept here in streaming
    form because that builder emits one batch SQL string. The file
    stream source requires a DIRECTORY; the single parquet file is
    staged into a temp dir via symlink (zero-copy).
    """
    path = f"{sf_dir}/documents.parquet"
    schema = spark.read.parquet(path).schema
    stage = stage_source(path, prefix)
    docs = spark.readStream.schema(schema).parquet(stage)
    words = "split(text, '\\\\s+')"
    orig = docs.select("doc_id", "text")
    mut = docs.where("doc_id % 5 = 0").selectExpr(
        "doc_id + 1000000 AS doc_id",
        f"array_join(slice({words}, 1, greatest(size({words}) - 3, 1)), ' ')"
        " AS text",
    )
    copies = docs.where("doc_id % 11 = 0").selectExpr(
        "doc_id + 2000000 AS doc_id", "text"
    )
    return orig.unionAll(mut).unionAll(copies)


def streaming_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate detection AS A STREAM: the continuously-ingesting
    form of `operators.dedup.exact_duplicates` — documents arrive on a
    file stream, the derived near-dup corpus branches (original / mutant
    / exact copy, same expressions as `sources.derived`) are unioned
    stream-side, and duplicate groups accumulate in a complete-mode
    hash-state aggregation keyed on the 128-bit digest. State is one
    entry per distinct text digest (the bounded-state shape: digest +
    count, never the text). Returns ``(text_hash, group_size)`` for
    groups > 1, identical to the batch oracle's digest/count pairs.
    """
    corpus = _stream_near_dup_corpus(spark, sf_dir, "docs_dedup_stream_")
    agg = (
        corpus.groupBy(F.md5("text").alias("text_hash"))
        .agg(F.count("*").alias("group_size"))
        .where(F.col("group_size") > 1)
    )
    name = f"stream_dedup_{uuid.uuid4().hex[:8]}"
    query = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table(name)


def streaming_bloom_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Bloom membership screen AS A STREAM: incoming documents
    arrive on a file stream and are screened against a STATIC Bloom
    bitset built (batch-side) from the existing corpus — the canonical
    continuous-ingest shape: the reference corpus is indexed once, and
    each micro-batch pays only a broadcast hash join against the ≤ m-row
    bitset plus per-doc aggregation state. Both static sides (bitset,
    exact-key set) join BEFORE the aggregation — Structured Streaming
    allows stream-static joins pre-aggregation; post-aggregation joins
    are not supported in complete mode.

    Output is identical to the batch `operators.dedup.bloom_filter_dedup`
    — the two registry entries share one oracle string by construction
    (the batch/streaming twin guard in ``plans/__init__``).
    """
    from ..operators.dedup import BLOOM_K, bloom_bit_positions
    from ..sources.derived import BLOOM_SPLIT_SPARK, derive_near_dup_corpus

    # Static side (batch): bitset + exact-key set of the existing split.
    docs_b = derive_near_dup_corpus(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
    )
    existing = docs_b.where(F.expr(BLOOM_SPLIT_SPARK) == 0)
    key_b = F.md5("text")
    bits = (
        existing.select(F.explode(bloom_bit_positions(key_b)).alias("bit"))
        .distinct()
        .withColumn("present", F.lit(1))
    )
    seen = existing.select(key_b.alias("key")).distinct().withColumn(
        "seen", F.lit(1)
    )

    # Stream side: documents file stream -> derived-corpus branches
    # (shared helper) -> incoming split.
    incoming = _stream_near_dup_corpus(
        spark, sf_dir, "docs_bloom_stream_"
    ).where(F.expr(BLOOM_SPLIT_SPARK) == 1)

    probed = (
        incoming.select("doc_id", F.md5("text").alias("key"))
        .select(
            "doc_id",
            "key",
            F.explode(bloom_bit_positions(F.col("key"))).alias("bit"),
        )
        .join(F.broadcast(bits), "bit", "left")
        .join(F.broadcast(seen), "key", "left")
        .groupBy("doc_id", "key", F.col("seen").isNotNull().alias("is_dup"))
        .agg(
            (
                F.sum(F.coalesce(F.col("present"), F.lit(0))) == BLOOM_K
            ).alias("bloom_hit")
        )
        .select("doc_id", "bloom_hit", "is_dup")
    )
    name = f"stream_bloom_{uuid.uuid4().hex[:8]}"
    query = (
        probed.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table(name)


def streaming_lsh_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MinHash-LSH near-dup membership screen AS A STREAM — the
    near-duplicate analogue of :func:`streaming_bloom_dedup`: the
    existing split's distinct ``(band_id, band_key)`` index is built
    batch-side ONCE; incoming documents arrive on a file stream,
    compute their signatures per-row (pure projection — zero stream
    state before the final rollup), explode to band keys and probe the
    static index through a stream-static equi-join. Output is identical
    to the batch `operators.dedup.lsh_screen` — the two registry
    entries share one oracle string by construction (the batch/
    streaming twin guard in ``plans/__init__``).
    """
    from ..operators.dedup import (
        banded_keys,
        hashed_shingle_arrays,
        minhash_signatures,
    )
    from ..sources.derived import BLOOM_SPLIT_SPARK, derive_near_dup_corpus

    # Static side (batch): the existing split's distinct band index.
    docs_b = derive_near_dup_corpus(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
    )
    idx = (
        banded_keys(
            minhash_signatures(
                hashed_shingle_arrays(
                    docs_b.where(F.expr(BLOOM_SPLIT_SPARK) == 0)
                )
            )
        )
        .select("band_id", "band_key")
        .dropDuplicates(["band_id", "band_key"])
        .withColumn("hit", F.lit(1))
    )

    # Stream side: documents file stream -> derived-corpus branches ->
    # incoming split -> per-row signatures -> band keys.
    incoming = _stream_near_dup_corpus(
        spark, sf_dir, "docs_lsh_stream_"
    ).where(F.expr(BLOOM_SPLIT_SPARK) == 1)
    inc = banded_keys(minhash_signatures(hashed_shingle_arrays(incoming)))

    probed = (
        inc.join(idx, ["band_id", "band_key"], "left")
        .groupBy("doc_id")
        .agg(
            F.sum(F.coalesce(F.col("hit"), F.lit(0)))
            .cast("bigint")
            .alias("n_bands_hit")
        )
        .withColumn("lsh_hit", F.col("n_bands_hit") > 0)
    )
    name = f"stream_lsh_{uuid.uuid4().hex[:8]}"
    query = (
        probed.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table(name)


def streaming_corpus_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-wins corpus upsert AS A STREAM — the continuous-ingest
    form of `operators.dedup.corpus_upsert` (the one recurring-crawl
    pattern that was still batch-only after the exact/Bloom/LSH
    screens): re-crawled documents arrive on a file stream (every 5th
    doc as version 2 with edited text, the batch twin's update
    relation built STREAM-SIDE), and per-key winner state accumulates
    in a complete-mode ``max(struct(version, text_hash))`` aggregation
    — one (version, digest) pair per UPDATED key, never the text, and
    never a row for the untouched corpus: state is bounded by the
    update stream's key cardinality, which a crawl window bounds by
    design. The drained winner set then resolves against the STATIC
    base snapshot batch-side — the merge-on-read pattern: the stream
    maintains the compacted delta, the snapshot join happens at read
    time (on a live pipeline the winner state would compact into a
    Delta/Hudi delta table in update mode, with a crawl-time watermark
    expiring keys once their re-crawl horizon passes).

    Output is identical to the batch `corpus_upsert` — the two
    registry entries share one oracle string by construction (the
    batch/streaming twin guard in ``plans/__init__``). The tie-break
    (equal versions resolve to the lexically larger digest) rides the
    same struct-max rule on both paths.
    """
    from pyspark.sql import Window

    path = f"{sf_dir}/documents.parquet"
    schema = spark.read.parquet(path).schema
    base = spark.read.parquet(path).select(
        "doc_id",
        F.lit(1).cast("bigint").alias("version"),
        F.md5("text").alias("text_hash"),
    )
    stage = stage_source(path, "docs_upsert_stream_")
    updates = (
        spark.readStream.schema(schema)
        .parquet(stage)
        .where(F.col("doc_id") % 5 == 0)
        .select(
            "doc_id",
            F.lit(2).cast("bigint").alias("version"),
            F.md5(F.concat(F.col("text"), F.lit(" [recrawled]"))).alias(
                "text_hash"
            ),
        )
    )
    winners = (
        updates.groupBy("doc_id")
        .agg(F.max(F.struct("version", "text_hash")).alias("m"))
        .select("doc_id", F.col("m.version").alias("version"),
                F.col("m.text_hash").alias("text_hash"))
    )
    name = f"stream_upsert_{uuid.uuid4().hex[:8]}"
    query = (
        winners.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    merged = base.unionByName(spark.table(name))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("version").desc(), F.col("text_hash").desc()
    )
    return (
        merged.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", "version", "text_hash")
    )


def streaming_ivf_upsert_assign(
    spark: SparkSession, sf_dir: str, quantizer=None
) -> DataFrame:
    """Continuous ANN index maintenance AS A STREAM — the streaming
    twin of `operators.kmeans.kmeans_ivf_assign_incoming`: the
    two-level quantizer (coarse Lloyd centroids + the base corpus's
    fine table) is built ONCE batch-side from the indexed half of the
    embeddings table (`ivf_quantizer`, both tables materialized);
    incoming vectors (the other half) arrive on a file stream and
    resolve their coarse cell through a stream-static join against the
    broadcast centroid table (constant-key equi-join — the supported
    stream-static shape for a bounded scoring table) with per-vector
    argmin state holding only (vec_id → (dist, cell)), never the
    embedding. The drained coarse assignment then resolves fine cells
    batch-side through the static fine table's coarse-cell equi-join
    (`_fine_resolve` — shared code with the batch twin), re-joining
    the embedding from the source relation instead of carrying it
    through stream state. Output identical to the batch twin; one
    oracle string by the registry guard.
    """
    from ..operators.kmeans import (
        _fine_resolve,
        _sq_dist,
        ivf_quantizer,
    )

    path = f"{sf_dir}/embeddings.parquet"
    schema = spark.read.parquet(path).schema
    emb = spark.read.parquet(path)
    # ``quantizer`` shares the batch-built (possibly parquet-reread)
    # static pair with the batch twin; deterministic build, identical
    # results either way.
    coarse, fine = (
        quantizer
        if quantizer is not None
        else ivf_quantizer(emb.where("vec_id % 2 = 0"))
    )

    stage = stage_source(path, "emb_ivf_stream_")
    inc = (
        spark.readStream.schema(schema)
        .parquet(stage)
        .where("vec_id % 2 = 1")
        .select(
            "vec_id",
            F.col("embedding").cast("array<double>").alias("e"),
        )
        .withColumn("jk", F.lit(0))
    )
    scored = inc.join(
        F.broadcast(coarse.withColumn("jk", F.lit(0))), "jk"
    ).select(
        "vec_id",
        "coarse",
        _sq_dist(F.col("e"), F.col("c")).alias("dc"),
    )
    best = (
        scored.groupBy("vec_id")
        .agg(F.min(F.struct("dc", "coarse")).alias("m"))
        .select("vec_id", F.col("m.coarse").alias("coarse"))
    )
    name = f"stream_ivf_{uuid.uuid4().hex[:8]}"
    query = (
        best.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    assigned = spark.table(name).join(
        emb.where("vec_id % 2 = 1").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("e")
        ),
        "vec_id",
    )
    return _fine_resolve(assigned, fine)


def streaming_pq_encode(
    spark: SparkSession, sf_dir: str, codebook: "DataFrame | None" = None
) -> DataFrame:
    """PQ encoding AS A STREAM — the code-index half of continuous ANN
    ingest (the cell half is :func:`streaming_ivf_upsert_assign`): the
    per-subspace codebook is Lloyd-LEARNED ONCE batch-side from the
    indexed half of the embeddings table (`pq.pq_codebook_learned` on
    its deterministic sample, materialized); incoming vectors arrive on
    a file stream, explode to (vec_id, subspace, subvector) rows
    stream-side (stateless projection), score against the BROADCAST
    M·K-row codebook through a stream-static equi-join on subspace, and
    keep the per-(vec_id, subspace) argmin in complete-mode state —
    (pair → best (d, code)), never the subvector. The drained rows ARE
    the index append: M small ints per vector. Output identical to the
    batch `pq_codes_upsert`; one oracle string by the registry guard.

    ``codebook`` (optional) supplies a prebuilt ``(subspace, cid,
    csub)`` table — e.g. the family-shared parquet build the batch twin
    encodes against (round 14, the `streaming_ivf_upsert_assign`
    ``quantizer`` contract): doubles round-trip parquet bit-exactly,
    so encodes against the stored copy equal encodes against the
    in-session learn. Default ``None`` learns it here.
    """
    from ..cache import materialize
    from ..operators import pq

    path = f"{sf_dir}/embeddings.parquet"
    schema = spark.read.parquet(path).schema
    emb = spark.read.parquet(path)
    if codebook is None:
        codebook = materialize(
            pq.pq_codebook_learned(emb.where("vec_id % 2 = 0"), train_mod=4)
        )
    else:
        # Prebuilt-table boundary guard (ADVICE r14): a mismatched
        # artifact fails loudly at the call boundary instead of
        # encoding silently wrong codes downstream.
        missing = {"subspace", "cid", "csub"} - set(codebook.columns)
        if missing:
            raise ValueError(
                "prebuilt codebook must carry (subspace, cid, csub); "
                f"missing {sorted(missing)} in {codebook.columns}"
            )

    stage = stage_source(path, "emb_pq_stream_")
    subs = F.array(
        *[
            F.struct(
                F.lit(i).alias("subspace"),
                pq._sub(F.col("e"), i).alias("sub"),
            )
            for i in range(pq.PQ_M)
        ]
    )
    inc = (
        spark.readStream.schema(schema)
        .parquet(stage)
        .where("vec_id % 2 = 1")
        .select(
            "vec_id", F.col("embedding").cast("array<double>").alias("e")
        )
        .select("vec_id", F.explode(subs).alias("s"))
        .select("vec_id", "s.subspace", "s.sub")
    )
    scored = inc.join(F.broadcast(codebook), "subspace").select(
        "vec_id",
        "subspace",
        "cid",
        pq._l2sq(F.col("sub"), F.col("csub")).alias("d"),
    )
    codes = (
        scored.groupBy("vec_id", "subspace")
        .agg(F.min(F.struct("d", "cid")).alias("m"))
        .select(
            "vec_id",
            F.col("subspace").cast("bigint").alias("subspace"),
            F.col("m.cid").alias("code"),
        )
    )
    name = f"stream_pq_{uuid.uuid4().hex[:8]}"
    query = (
        codes.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table(name)


def streaming_dedup_to_parquet(
    spark: SparkSession, sf_dir: str, out_dir: str, checkpoint_dir: str
) -> None:
    """Streaming ingest with an exactly-once file sink: events stream →
    per-key dedup (``dropDuplicates`` on event_id, state bounded by the
    watermark) → parquet append with a checkpoint.

    The checkpoint carries source offsets + sink commit log, so
    re-running over the same input is a no-op — the restart-resume
    guarantee a 100 TB ingest pipeline depends on
    (``tests/test_streaming_sink.py`` restarts the query and asserts
    zero duplicate output).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = f"{sf_dir}/events.parquet"
    schema = spark.read.parquet(path).schema
    stage = stage_source(path, "events_sink_")
    stream = (
        spark.readStream.schema(schema)
        .parquet(stage)
    )
    stream = (
        with_event_time(stream)
        .withWatermark("ts_ts", "1 hour")
        .dropDuplicates(["event_id"])
        .select("event_id", "user_id", "event_type", "value", "ts_us")
    )
    query = (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()


def streaming_purchase_attribution(
    spark: SparkSession, sf_dir: str, lookback_us: int = HOUR_US
) -> DataFrame:
    """Last-touch attribution AS A STREAM: the stream-static form of
    ``operators.events.purchase_attribution``. Non-purchase TOUCH
    events arrive on a file stream and join the STATIC purchase-window
    table through the same bucketed ``(user_id, bucket)`` equi-key +
    inline interval predicate as the batch ``range_join`` — a
    stream-static inner join, the supported continuous-ingest shape
    (each micro-batch pays one hash join against the window table; on
    a live pipeline the windows relation would be a compacted Delta
    table). Per-purchase counts/value accumulate in complete-mode
    aggregation state keyed by purchase_id — bounded by the number of
    purchases with in-window traffic, not by the stream. The
    zero-preserving purchase left join runs batch-side on the drained
    result, so the query shares the batch twin's DuckDB oracle by
    construction.
    """
    from ..operators.events import _sum_value_exact

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = f"{sf_dir}/events.parquet"
    schema = spark.read.parquet(path).schema
    stage = stage_source(path, "events_attr_stream_")
    touches = (
        with_event_time(spark.readStream.schema(schema).parquet(stage))
        .where(F.col("event_type") != "purchase")
        .select("user_id", "ts_us", "value")
        .withColumn("bucket", F.expr(f"ts_us div {int(lookback_us)}"))
    )
    wins = (
        with_event_time(spark.read.parquet(path))
        .where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts_us").alias("purchase_ts_us"),
            (F.col("ts_us") - lookback_us).alias("start_us"),
            F.col("ts_us").alias("end_us"),
        )
    )
    spans = wins.withColumn(
        "bucket",
        F.explode(
            F.sequence(
                F.expr(f"start_us div {int(lookback_us)}"),
                F.expr(f"(end_us - 1) div {int(lookback_us)}"),
            )
        ),
    ).select("purchase_id", "user_id", "bucket", "start_us", "end_us")
    agg = (
        touches.join(spans, ["user_id", "bucket"])
        .where(
            (F.col("ts_us") >= F.col("start_us"))
            & (F.col("ts_us") < F.col("end_us"))
        )
        .groupBy("purchase_id")
        .agg(
            F.count("*").alias("n_attributed"),
            _sum_value_exact().alias("attributed_value"),
        )
    )
    name = f"stream_attr_{uuid.uuid4().hex[:8]}"
    query = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    matched = spark.table(name)
    return (
        wins.select("purchase_id", "user_id", "purchase_ts_us")
        .join(matched, "purchase_id", "left")
        .select(
            "purchase_id",
            "user_id",
            "purchase_ts_us",
            F.coalesce(F.col("n_attributed"), F.lit(0))
            .cast("bigint")
            .alias("n_attributed"),
            F.coalesce(F.col("attributed_value"), F.lit(0.0)).alias(
                "attributed_value"
            ),
        )
    )


def streaming_dedup_watermarked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once ingest from an at-least-once source — the
    watermark-BOUNDED form of per-key dedup state.

    ``streaming_distinct_users`` / ``streaming_dedup_to_parquet`` hold
    one state entry per distinct key for the lifetime of the query:
    fine for a drain job, unbounded on a continuous 100 TB ingest. This
    is the shape a live pipeline runs instead: events arrive on a file
    stream with planted retransmissions (every 7th event is delivered
    twice — the at-least-once contract of any replayable bus), the
    stream carries an event-time watermark, and
    ``dropDuplicatesWithinWatermark`` on the delivery key keeps the
    FIRST copy while holding per-key state only until the watermark
    passes that key's event time plus the delay — state is bounded by
    event-rate × delay window, independent of corpus cardinality. The
    guarantee is correspondingly scoped: duplicates separated by more
    than the delay can both pass (the documented at-most-one-per-window
    semantics); retransmissions in real buses arrive seconds apart, so
    a 1 h delay covers them with margin.

    Retained deliveries are emitted append-mode; the batch-side rollup
    counts them per type. Oracle: distinct event_id per type over the
    duplicated delivery relation — each event counted once despite
    double delivery.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = f"{sf_dir}/events.parquet"
    schema = spark.read.parquet(path).schema
    stage = stage_source(path, "events_wm_dedup_")
    raw = spark.readStream.schema(schema).parquet(stage)
    deliveries = raw.unionAll(raw.where("event_id % 7 = 0"))
    retained = (
        with_event_time(deliveries)
        .withWatermark("ts_ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", "event_type")
    )
    name = f"stream_wm_dedup_{uuid.uuid4().hex[:8]}"
    query = (
        retained.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return (
        spark.table(name)
        .groupBy("event_type")
        .agg(F.count("*").alias("n_events"))
    )


def streaming_boilerplate_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The boilerplate span screen AS A STREAM — the span-level sibling
    of :func:`streaming_lsh_screen`: the existing split's boilerplate
    span index (span digests with document frequency >= 2 WITHIN the
    indexed split, `textops.boilerplate_index`) is built batch-side
    ONCE; incoming documents arrive on a file stream, split into
    non-overlapping spans per-row (posexplode — zero stream state
    before the rollup) and probe the static index through a
    stream-static equi-join, one aggregation. Output identical to the
    batch `boilerplate_screen` entry — one oracle string by the
    batch/streaming twin guard in ``plans/__init__``."""
    from ..operators.textops import boilerplate_index, boilerplate_screen
    from ..sources.derived import BLOOM_SPLIT_SPARK, derive_near_dup_corpus

    docs_b = derive_near_dup_corpus(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
    )
    idx = boilerplate_index(
        docs_b.where(F.expr(BLOOM_SPLIT_SPARK) == 0), min_docs=2
    )
    incoming = _stream_near_dup_corpus(
        spark, sf_dir, "docs_boiler_stream_"
    ).where(F.expr(BLOOM_SPLIT_SPARK) == 1)
    probed = boilerplate_screen(incoming, idx)
    name = f"stream_boiler_{uuid.uuid4().hex[:8]}"
    query = (
        probed.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table(name)


def streaming_dsir_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR scoring AS A STREAM — importance scoring at ingest: the
    likelihood-ratio table learns batch-side ONCE from the indexed half
    of the raw documents (`textops.dsir_bucket_ratios`, target = the
    English slice); incoming documents stream in, explode to
    position-keyed token buckets (stateless), resolve ratios through a
    broadcast stream-static join, and fold per document in ONE
    aggregation (`textops.dsir_score` — the token-level shape exists
    precisely because streaming allows a single aggregation). Output
    identical to the batch `dsir_score` entry — one oracle string by
    the twin guard."""
    from ..operators.textops import dsir_bucket_ratios, dsir_score

    path = f"{sf_dir}/documents.parquet"
    docs_b = spark.read.parquet(path)
    ratios, default = dsir_bucket_ratios(
        docs_b.where("doc_id % 2 = 0"), F.col("lang") == "en"
    )
    schema = docs_b.schema
    stage = stage_source(path, "docs_dsir_stream_")
    incoming = (
        spark.readStream.schema(schema).parquet(stage).where("doc_id % 2 = 1")
    )
    scored = dsir_score(incoming, ratios, default)
    name = f"stream_dsir_{uuid.uuid4().hex[:8]}"
    query = (
        scored.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table(name)


def streaming_bm25_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 percolation AS A STREAM — standing keyword queries, arriving
    documents: corpus statistics (N, Σdl, per-term df) build batch-side
    ONCE from the indexed half (`textops.bm25_index_stats`); incoming
    documents stream in, take per-term tf from a stateless array-filter
    projection after the broadcast panel join, and fold per (doc,
    query) in ONE aggregation (`textops.bm25_route` — the
    single-aggregation shape exists precisely so this twin can run it
    unchanged). Output identical to the batch `bm25_route` entry — one
    oracle string by the twin guard."""
    from ..operators import textops
    from ..operators.textops import bm25_index_stats, bm25_route

    path = f"{sf_dir}/documents.parquet"
    docs_b = spark.read.parquet(path)
    panel = spark.createDataFrame(
        textops.BM25_PANEL, "query_id bigint, term string"
    )
    stats, df_rel = bm25_index_stats(docs_b.where("doc_id % 2 = 0"), panel)
    schema = docs_b.schema
    stage = stage_source(path, "docs_bm25_stream_")
    incoming = (
        spark.readStream.schema(schema).parquet(stage).where("doc_id % 2 = 1")
    )
    routed = bm25_route(incoming, panel, stats, df_rel)
    name = f"stream_bm25_{uuid.uuid4().hex[:8]}"
    query = (
        routed.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table(name)


def streaming_decontaminate_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surgical decontamination AS A STREAM — scrub-at-ingest: the eval
    corpus's overlapping-span digest index builds batch-side ONCE
    (`textops.eval_span_index`); incoming train documents stream in,
    split to non-overlapping spans (stateless posexplode), flag
    contaminated spans through one stream-static digest join, and
    rebuild per document in ONE aggregation — the single-aggregation
    shape `textops.decontaminate_scrub` was written in precisely so
    this twin runs it unchanged. Output identical to the batch
    `decontaminate_scrub` entry — one oracle string by the twin
    guard."""
    from ..operators.textops import decontaminate_scrub
    from ..sources.derived import derive_near_dup_corpus

    # Static side: the eval split's overlapping-span digest index input
    # (the derived nd corpus, so planted near-dups straddle the split).
    nd_b = derive_near_dup_corpus(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
    )
    ev = nd_b.where("doc_id % 13 = 7")
    # Stream side: the same derived-corpus branches applied stream-side.
    incoming = _stream_near_dup_corpus(
        spark, sf_dir, "docs_scrub_stream_"
    ).where("doc_id % 13 <> 7")
    scrubbed = decontaminate_scrub(incoming, ev)
    name = f"stream_scrub_{uuid.uuid4().hex[:8]}"
    query = (
        scrubbed.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table(name)


def streaming_quality_classifier(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hashed linear quality scoring AS A STREAM — model-scored
    admission at ingest: `textops.quality_classifier` is a pure per-row
    projection (tokenize → per-token weight → one in-row integer fold),
    so the IDENTICAL expressions run under Structured Streaming with
    NO state at all — append mode, no watermark, no aggregation; the
    cheapest possible streaming shape, and the reason the scorer was
    built as an in-row fold instead of an explode + groupBy. Scores
    the odd-doc_id half (the batch twin scores the same slice) — one
    oracle string by the registry twin guard."""
    from ..operators.textops import quality_classifier

    path = f"{sf_dir}/documents.parquet"
    schema = spark.read.parquet(path).schema
    stage = stage_source(path, "docs_qc_stream_")
    incoming = (
        spark.readStream.schema(schema).parquet(stage).where("doc_id % 2 = 1")
    )
    scored = quality_classifier(incoming)
    name = f"stream_qc_{uuid.uuid4().hex[:8]}"
    query = (
        scored.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table(name)


def streaming_sentence_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence-boilerplate screening AS A STREAM — the C4-granularity
    ingest gate: the indexed split's repeated-sentence digest index
    builds batch-side once (`textops.sentence_index`); incoming
    documents explode to sentences statelessly, probe the static index
    through one stream-static equi-join, and roll up per document in
    ONE aggregation (`textops.sentence_screen` — shared code, so batch
    and stream cannot drift). One oracle string by the twin guard."""
    from ..operators.textops import sentence_index, sentence_screen
    from ..sources.derived import (
        BLOOM_SPLIT_SPARK,
        derive_near_dup_corpus,
        derive_sentenced_corpus,
    )

    docs_b = derive_sentenced_corpus(
        derive_near_dup_corpus(
            spark.read.parquet(f"{sf_dir}/documents.parquet")
        )
    )
    idx = sentence_index(docs_b.where(F.expr(BLOOM_SPLIT_SPARK) == 0))
    incoming = derive_sentenced_corpus(
        _stream_near_dup_corpus(spark, sf_dir, "docs_sent_stream_")
    ).where(F.expr(BLOOM_SPLIT_SPARK) == 1)
    screened = sentence_screen(incoming, idx)
    name = f"stream_sent_{uuid.uuid4().hex[:8]}"
    query = (
        screened.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table(name)


def streaming_rate_anomalies(
    spark: SparkSession, sf_dir: str, width_us: int = HOUR_US
) -> DataFrame:
    """Event-rate anomaly ALERTING as a stream — the deployment
    `operators.events.rate_anomalies` actually ships (a batch anomaly
    report is a post-mortem; alerting is inherently continuous).

    Split along the state boundary the batch docstring already names:

    * the per-(type, window) COUNTS are stream-native — event-time
      tumbling window + watermark, complete-mode aggregation state
      bounded by #types × #open-windows (the same shape as
      `streaming_tumbling_window`);
    * the per-type mean/σ baseline is SLOWER-MOVING STATE evaluated
      batch-side on the drained counts (on a live pipeline it would be
      a periodically-refreshed static table, exactly like
      `streaming_sentence_screen`'s digest index) — a #types-row
      aggregate, broadcast back onto the counts, then the exact-integer
      two-sigma rule ``(cnt·n − Σcnt)² > 4·(n·Σcnt² − (Σcnt)²)``.

    Drained counts equal the batch bucketing (epoch-aligned windows:
    ``unix_micros(window.start) == (ts_us div w)·w``), so the twin
    shares the batch `SQL_EVENTS_ANOMALY` oracle by construction — the
    same drain-then-stateless-postjoin contract as
    `streaming_purchase_attribution`.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = f"{sf_dir}/events.parquet"
    schema = spark.read.parquet(path).schema
    stage = stage_source(path, "events_anom_stream_")
    stream = with_event_time(spark.readStream.schema(schema).parquet(stage))
    seconds = width_us // 1_000_000
    counts = (
        stream.withWatermark("ts_ts", "1 hour")
        .groupBy(F.window("ts_ts", f"{seconds} seconds"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            "event_type",
            F.unix_micros(F.col("window.start")).alias("window_start_us"),
            "n_events",
        )
    )
    name = f"stream_anom_{uuid.uuid4().hex[:8]}"
    query = (
        counts.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    from ..cache import materialize
    from ..operators.events import anomaly_flag

    # anomaly_flag self-joins its input (counts ⋈ stats-over-counts);
    # two scans of one memory-sink table fail analysis (duplicate
    # attribute ids from the shared streaming relation), so snapshot
    # the drained counts first — also the honest serving shape: the
    # baseline reads a materialized counts table, not the live stream.
    return anomaly_flag(materialize(spark.table(name)))


def streaming_quality_classifier_learned(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """LEARNED quality scoring AS A STREAM — the model-artifact
    deployment: the ONE-ROW diagonal-LDA model trains batch-side once
    (`textops.quality_classifier_model` on the deterministic
    `doc_id % 4 == 0` split — on a live pipeline, a periodically
    re-trained static artifact, exactly like
    `streaming_sentence_screen`'s digest index); incoming odd-doc_id
    documents score through the SHARED
    `textops.quality_classifier_learned` code path — a broadcast
    one-row stream-static join feeding a pure projection, so the
    stream runs APPEND-mode with NO state at all (the cheapest
    streaming shape, same as `streaming_quality_classifier`). One
    oracle string with the batch twin by the registry guard."""
    from ..operators.textops import (
        quality_classifier_learned,
        quality_classifier_model,
    )

    path = f"{sf_dir}/documents.parquet"
    schema = spark.read.parquet(path).schema
    model = quality_classifier_model(spark.read.parquet(path))
    stage = stage_source(path, "docs_qcl_stream_")
    incoming = (
        spark.readStream.schema(schema).parquet(stage).where("doc_id % 2 = 1")
    )
    scored = quality_classifier_learned(incoming, model)
    name = f"stream_qcl_{uuid.uuid4().hex[:8]}"
    query = (
        scored.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table(name)


def streaming_label_upsert(
    spark: SparkSession, sf_dir: str, labels: "DataFrame | None" = None
) -> DataFrame:
    """Incremental duplicate-cluster maintenance AS A STREAM — the
    streaming twin of `operators.dedup.label_upsert`: the existing
    split's banded keys, shingle arrays, and cluster-label table build
    ONCE batch-side (the persisted-snapshot posture); incoming docs
    arrive on a file stream, compute shingle arrays + minhash lanes +
    band keys per-row (pure projections — zero stream state before the
    final rollup, with the shingle array CARRIED through the band
    explode because a stream cannot self-join it back), probe the
    static band keys through one stream-static equi-join, verify by
    exact per-row Jaccard against the static shingle arrays, pick up
    the matched doc's cluster label by one more stream-static left
    join, and fold to min-adopted-label per incoming doc in ONE
    aggregation. Duplicate (a, b) band collisions need no distinct —
    the min fold absorbs them. Unmatched docs never reach the
    aggregation, so the self-label fill joins the drained table against
    the source relation batch-side (the `streaming_ivf_upsert_assign`
    post-drain convention). Output identical to the batch
    `dup_labels_upsert` entry — one oracle string by the twin guard."""
    from ..operators.dedup import (
        banded_keys,
        connected_components,
        hashed_shingle_arrays,
        minhash_near_duplicates,
        minhash_signatures,
    )
    from ..sources.derived import BLOOM_SPLIT_SPARK, derive_near_dup_corpus

    split = F.expr(BLOOM_SPLIT_SPARK)
    nd_b = derive_near_dup_corpus(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
    )
    existing = nd_b.where(split == 0)
    ex_hashed = hashed_shingle_arrays(existing)
    # Round-15 negative result (VERDICT r14 item 4): materializing
    # this narrow band index before the stream start measured
    # 3.70 → 4.06 s min-of-3 (the availableNow drain evaluates the
    # static side once, so the checkpoint only added its own write
    # barrier). Left lazy; the twin's residual cost is micro-batch
    # planning + state-store setup, not a re-executed static subtree.
    ex_bands = banded_keys(minhash_signatures(ex_hashed)).select(
        F.col("doc_id").alias("b"), "band_id", "band_key"
    )
    # ``labels`` shares the batch-built (possibly parquet-reread)
    # snapshot with the batch twin; deterministic build, identical
    # results either way.
    if labels is None:
        pairs = minhash_near_duplicates(existing, 0.5).select("a", "b")
        labels = connected_components(pairs, check_every=2)
    lab_b = labels.select(
        F.col("node").alias("b"), F.col("label").alias("ex_label")
    )

    incoming = _stream_near_dup_corpus(
        spark, sf_dir, "docs_labup_stream_"
    ).where(split == 1)
    inc_h = hashed_shingle_arrays(incoming)
    sigs = minhash_signatures(inc_h, keep=("hs",))
    inc_bands = banded_keys(sigs, keep=("hs",)).select(
        F.col("doc_id").alias("a"),
        F.col("hs").alias("hs_a"),
        "band_id",
        "band_key",
    )
    cand = inc_bands.join(ex_bands, ["band_id", "band_key"])
    full = cand.join(
        ex_hashed.select(
            F.col("doc_id").alias("b"), F.col("hs").alias("hs_b")
        ),
        "b",
    )
    i = F.size(F.array_intersect("hs_a", "hs_b"))
    verified = full.where(
        i / (F.size("hs_a") + F.size("hs_b") - i) >= 0.5
    ).select("a", "b")
    adopted = (
        verified.join(lab_b, "b", "left")
        .select(
            "a",
            F.coalesce(F.col("ex_label"), F.col("b")).alias("cand_label"),
        )
        .groupBy("a")
        .agg(F.min("cand_label").alias("m"))
    )
    name = f"stream_labup_{uuid.uuid4().hex[:8]}"
    query = (
        adopted.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    drained = spark.table(name).withColumnRenamed("a", "doc_id")
    return (
        nd_b.where(split == 1)
        .select("doc_id")
        .join(drained, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("m"), F.col("doc_id")).alias("label"),
            F.col("m").isNotNull().alias("matched"),
        )
    )


def streaming_image_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The image-ingest membership screen AS A STREAM — the image
    analogue of :func:`streaming_lsh_screen` and the production shape
    of `multimodal.image_screen`: the existing split's distinct ahash
    ``(band_id, band_key)`` index is built batch-side ONCE
    (`multimodal.image_band_index` — persistable parquet, the
    `lsh_index_roundtrip` posture); new images arrive on a file
    stream, decode + 8×8 average-hash per row (the one Arrow
    boundary, `image_ahash_features` on the stream — zero state
    before the final rollup), explode to band keys and probe the
    static index through a stream-static equi-join. Output identical
    to the batch `image_screen` — the two registry entries share one
    oracle string by construction (the twin guard in
    ``plans/__init__``)."""
    from ..operators.multimodal import (
        image_band_index,
        image_screen_from_index,
    )
    from ..sources.derived import BLOOM_SPLIT_SPARK

    # Documents framed as 8x8 binary PPMs — the same expressions as
    # plans.ext_multimodal._ppm_media, kept here in streaming form
    # (that builder lives in the registration layer); divergence would
    # fail the shared batch/streaming oracle.
    def _media(docs):
        raster = F.rpad(F.substring("text", 1, 192), 192, " ")
        payload = F.encode(
            F.concat(F.lit("P6\n8 8\n255\n"), raster), "utf-8"
        )
        return docs.select(
            "doc_id",
            payload.alias("payload"),
        )

    path = f"{sf_dir}/documents.parquet"
    schema = spark.read.parquet(path).schema
    docs_b = spark.read.parquet(path)
    idx = image_band_index(
        _media(docs_b.where(F.expr(BLOOM_SPLIT_SPARK) == 0))
    )
    incoming = _media(
        spark.readStream.schema(schema)
        .parquet(stage_source(path, "docs_imgscreen_stream_"))
        .where(F.expr(BLOOM_SPLIT_SPARK) == 1)
    )
    probed = image_screen_from_index(idx, incoming, index_is_distinct=True)
    name = f"stream_imgscreen_{uuid.uuid4().hex[:8]}"
    query = (
        probed.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table(name)
