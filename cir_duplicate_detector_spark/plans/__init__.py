"""Query registry exposed through ``__spark_entry__``.

``ALL_QUERIES``: name -> (spark_callable(spark, sf_dir) -> DataFrame,
duckdb_oracle_sql | None).

Ordering is deliberate: the correctness driver cross-checks the FIRST
50 registry entries against the DuckDB oracle, so which 50 lead decides
which queries get a CURRENT driver-green row this round. At the current
registry size (120+) that is a standing ROTATION, not an ad-hoc list
(round-5 verdict item 2). The policy, in priority order:

1. queries with NO driver row in any ``CORRECTNESS_r*.json`` (new this
   round or never yet inside the window);
2. queries whose PLAN changed this round in a result-affecting way
   (``_PLAN_CHANGED`` — maintained by hand each round, because only the
   author knows which edits change results vs physical shape);
3. everything else by last driver-verified round ASCENDING (stalest
   first), ties in registry order.

The ordering is COMPUTED from the committed correctness artifacts at
import time, so it cannot drift from reality the way a hand-written
list did (round-5 advice: the hand-list's comment contradicted itself).
Invariant: with ~N queries and a 50-slot window, stalest-first means
no query's driver row is ever older than ceil(N/50) rounds (4 at the
current 168 — new never-verified queries take their window slots ahead
of the stalest re-verifications by design: a first row beats a fourth
refresh).

Every query is additionally covered by the local parametric parity
suite (`tests/test_oracle_parity.py`), which has no cap; the priority
only controls which subset the driver's independent gate re-verifies
this round.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

from .core_queries import CORE_QUERIES

_MERGED: dict[str, tuple] = {}
_MERGED.update(CORE_QUERIES)

try:  # extension registries appear as they are built
    from .extension_queries import EXTENSION_QUERIES

    _MERGED.update(EXTENSION_QUERIES)
except ImportError:
    pass

# Queries whose ROUND-13 edits change their PLAN. The builder's
# evidence says results are identical (or the query is brand-new), but
# under the fingerprint-lint semantics (plans/fingerprint.py) a changed
# logical plan re-verifies at the driver regardless — cheap insurance
# that a "physical-only" claim can never be wrong silently:
_PLAN_CHANGED: list[str] = [
    # Round 14.
    #
    # (a) OPQ A/B coarse-centroid share (VERDICT r13 item 7): both
    # skewed recall rows consume the pair-shared identity-layout
    # coarse build (`ext_ann_recall._shared_skewed_coarse`); the A
    # row's values are identical by construction (same learn, parquet
    # round-trip exact), the B row now learns coarse in identity space
    # and projects through the permutation — its ORACLE changed in
    # lockstep (coarse0 over n0 + c[pm[i]]), local parity green.
    # (b) Skewed-corpus share (round 14): both rows serve the derived
    # skewed corpus from one pair-shared parquet
    # (`ext_ann_recall._shared_skewed_corpus`) instead of each paying a
    # per-run localCheckpoint of the identical deterministic
    # projection; doubles round-trip parquet bit-exactly, oracle
    # unchanged, local parity green.
    "pq_recall_skewed",
    "pq_recall_skewed_opq",
    # (c) pq.py encode-chain keyed repartition + carried-argmin
    # assignment (guide §2.4): explode→score→argmin→pack now rides ONE
    # hash exchange on vec_id and the assign→residualize equi-join is
    # gone. Values identical (argmin winner unchanged — (d, cluster)
    # unique per vec_id); pq-family oracle parity re-run green.
    "knn_pq_adc",
    "pq_codes_upsert",
    # (d) kmeans.py Lloyd argmin carries the member vector through the
    # min(struct(...)) aggregation instead of re-joining e per round —
    # one fewer Exchange/round, identical members relation; kmeans +
    # ivf-family parity green.
    "kmeans_embeddings",
    # (e) textops.py BM25 search/stats restructure: explode-built
    # inverted index → per-row array projections (dl = size(tokens),
    # tf via array_remove against the broadcast panel), zero explode
    # shuffles. Same postings, same scores (tokens drops empties so
    # both dl forms agree); bm25 + hybrid families parity green.
    "bm25_search",
    "bm25_route",
    "hybrid_search",
    "hybrid_search_served",
    "hybrid_search_fresh",
    # (f) ext_pipeline.py recall diagnostics served from pair-shared
    # parquet of the twin serving row's own output (the r12-blessed
    # _shared_hybrid_truth pattern extended to served/fresh): the
    # builder CALLS the registered query fn, so values are the twin's
    # by construction; hybrid family parity green.
    "hybrid_recall",
    "hybrid_fresh_recall",
    # (g) The same served-from-the-registered-row's-parquet contract
    # extended to every remaining diagnostic that re-ran a stack its
    # twin row already times end-to-end (guide §1.2):
    # fuzzy_decon_recall's found side + decontamination_report's
    # fz/scrub sides (= decontaminate_fuzzy / decontaminate_scrub),
    # ann_recall_lsh / ann_recall_ivf's both sides (=
    # knn_cosine_bruteforce / knn_cosine_lsh / knn_cosine_ivf, with
    # ONE shared brute-force truth artifact), minhash_recall's found
    # side (= dedup_minhash restricted to probe-touching pairs), and
    # dedup_simhash_pairs' signature stage (= dedup_simhash). Builders
    # call the registered query functions; persisted columns are exact
    # bigints — values identical by construction, parity re-run green.
    "fuzzy_decon_recall",
    "decontamination_report",
    "ann_recall_lsh",
    "ann_recall_ivf",
    "minhash_recall",
    "dedup_simhash_pairs",
    # (h) Upsert-family shared PQ codebook (the _shared_upsert_quantizer
    # posture): the batch and streaming twins each re-learned the
    # identical deterministic Lloyd codebook per run; one parquet-backed
    # build now serves both. Doubles round-trip parquet bit-exactly
    # (unit-pinned); parity re-run green.
    "pq_codes_upsert_streaming",
]

# Per-round edit declarations (round-9 lint, verdict item 6): every
# package file changed since the latest COMMITTED round artifact must
# be declared here — either as the tuple of queries whose RESULTS the
# edit changes (each must then be in _PLAN_CHANGED, or be brand-new and
# therefore lead the rotation anyway), or as a written reason why the
# edit cannot change any registered result. `tests/test_plans.py::
# test_round_edits_are_declared` enforces the mapping, so a
# result-affecting edit can no longer silently skip the driver window.
# Stale entries (files no longer in the diff after the driver commits
# the round's artifacts) are harmless and cleared opportunistically.
_PKG = "cir_duplicate_detector_spark"
_ROUND_EDITS: dict[str, "tuple[str, ...] | str"] = {
    f"{_PKG}/plans/__init__.py": "round-14 rotation metadata reset"
    " (cleared round-13 _ROUND_EDITS/_PLAN_CHANGED — all r13 entries"
    " driver-verified and committed); no query plan or result touched",
    f"{_PKG}/operators/pdqimage.py": "NEW module: fixed-point true-PDQ"
    " hash from image bytes (VERDICT r13 item 1) feeding the NEW"
    " image_pdq_hashes / image_pdq_near_dup rows (brand-new, lead the"
    " rotation); no existing query touched",
    f"{_PKG}/plans/ext_multimodal.py": "NEW image_pdq_hashes /"
    " image_pdq_near_dup registrations (corpus builder + full SQL"
    " oracle replay of the fixed-point PDQ pipeline); existing"
    " multimodal rows untouched",
    f"{_PKG}/plans/extension_queries.py": "round-14 _ORDER additions"
    " (image_pdq_hashes, image_pdq_near_dup) + ext_ann_recall merge"
    " wiring for the r13-item-6 module split; no existing query"
    " touched",
    f"{_PKG}/plans/ext_ann.py": (
        "ann_recall_lsh",
        "ann_recall_ivf",
        "pq_codes_upsert",
        "pq_codes_upsert_streaming",
    ),  # module split (VERDICT r13 item 6): recall/OPQ rows moved
    # verbatim to ext_ann_recall.py; _sql_ivf_pq_chain gained the
    # coarse_body parameter (default None emits the byte-identical
    # historical chain). Round-14 optimization: the two ANN recall
    # diagnostics serve both sides from the registered serving rows'
    # pair-shared parquet, and the upsert twins share one parquet-backed
    # PQ codebook build (see _PLAN_CHANGED (g)/(h)); oracles unchanged.
    f"{_PKG}/plans/ext_ann_recall.py": (
        "pq_recall_skewed",
        "pq_recall_skewed_opq",
    ),  # NEW module from the split (entries verbatim) + the r13-item-7
    # coarse-centroid share and the skewed-corpus parquet share for
    # the A/B pair (see _PLAN_CHANGED)
    f"{_PKG}/operators/pq.py": (
        "pq_recall_skewed",
        "pq_recall_skewed_opq",
        "knn_pq_adc",
        "pq_codes_upsert",
    ),  # coarse_cents now composes with opq (provided table projected
    # through the learned transform — VERDICT r13 item 7); persist
    # deletes stale perm/rot parts when absent and read refuses
    # marker-less part dirs (ADVICE r13) — non-plan lifecycle fixes;
    # round-14 optimization: encode-chain keyed repartition + carried
    # argmin (see _PLAN_CHANGED (c))
    f"{_PKG}/operators/kmeans.py": ("kmeans_embeddings",),
    # round-14 optimization: Lloyd argmin carries the member vector
    # through the aggregation struct (see _PLAN_CHANGED (d)); the other
    # kmeans consumers' final plans are unchanged (fingerprint-diff
    # verified — the carried form only alters the eager learn jobs)
    f"{_PKG}/operators/textops.py": (
        "bm25_search",
        "bm25_route",
        "hybrid_search",
        "hybrid_search_served",
        "hybrid_search_fresh",
    ),  # round-14 optimization: BM25 tf/dl projection shape replaces
    # the explode-built inverted index (see _PLAN_CHANGED (e)); rows
    # embedding the lexical stage pick up the new shape
    f"{_PKG}/plans/ext_pipeline.py": (
        "hybrid_recall",
        "hybrid_fresh_recall",
        "fuzzy_decon_recall",
        "decontamination_report",
    ),  # round-14 optimization: recall diagnostics compare the twin
    # serving rows' pair-shared parquet output instead of re-running
    # the full serving stack (see _PLAN_CHANGED (f)/(g))
    f"{_PKG}/plans/ext_dedup.py": (
        "minhash_recall",
        "dedup_simhash_pairs",
    ),  # round-14 optimization: minhash_recall's found side serves from
    # dedup_minhash's pair-shared parquet; dedup_simhash_pairs bands
    # over dedup_simhash's pair-shared signature parquet (see
    # _PLAN_CHANGED (g))
    f"{_PKG}/operators/dedup.py": ("dedup_simhash_pairs",),
    # round-14 optimization: simhash_near_duplicates gained an optional
    # prebuilt-sigs parameter (identity unit-pinned); default behavior
    # byte-identical
    f"{_PKG}/streaming/windows.py": ("pq_codes_upsert_streaming",),
    # round-14 optimization: streaming_pq_encode gained an optional
    # prebuilt-codebook parameter (the streaming_ivf_upsert_assign
    # quantizer contract); default behavior byte-identical
    f"{_PKG}/cache.py": "tracked_mkdtemp retains one superseded"
    " generation per family and tombstones the grand-previous dir"
    " (VERDICT r13 item 5 / ADVICE r13); lifecycle only, no query"
    " plan or result touched",
}


def _latest_tracked_round(root: Path) -> "int | None":
    """Highest CORRECTNESS round COMMITTED to git, or None when git is
    unavailable (pip install, exported tree — where only committed
    artifacts exist on disk anyway, so no bound is needed)."""
    import subprocess

    try:
        out = subprocess.run(
            ["git", "ls-files", "CORRECTNESS_r*.json"],
            cwd=root,
            capture_output=True,
            text=True,
            timeout=30,
        )
    except (OSError, subprocess.TimeoutExpired):
        return None
    if out.returncode != 0:
        return None
    rounds = []
    for name in out.stdout.splitlines():
        m = re.search(r"r(\d+)", name)
        if m:
            rounds.append(int(m.group(1)))
    return max(rounds, default=None)


def _last_verified_round(
    root: "Path | None" = None, max_round: "int | None" = None
) -> dict[str, int]:
    """name -> latest round with a driver row, from the committed
    ``CORRECTNESS_r*.json`` artifacts (repo root). Missing files (fresh
    clone, round 1) yield {} and the registry keeps insertion order.

    ``max_round`` bounds the scan to committed rounds: the driver drops
    the new round's artifact UNTRACKED right after the builder's final
    commit, and counting it would make this working tree's rotation
    diverge from a fresh clone of HEAD — the exact one-round lag that
    made `tests/test_plans.py::test_round_edits_are_declared` misfire
    at the round-9 boundary (VERDICT r9 item 1). Artifacts whose round
    exceeds ``max_round`` are ignored; ``None`` means no bound.
    """
    last: dict[str, int] = {}
    if root is None:
        root = Path(__file__).resolve().parents[2]
    for f in sorted(root.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", f.name)
        if not m:
            continue
        rnd = int(m.group(1))
        if max_round is not None and rnd > max_round:
            continue
        try:
            rows = json.loads(f.read_text())
        except (OSError, json.JSONDecodeError):
            continue
        for name in rows:
            last[name] = max(last.get(name, 0), rnd)
    return last


_ROOT = Path(__file__).resolve().parents[2]
_LAST = _last_verified_round(_ROOT, _latest_tracked_round(_ROOT))
_REG_POS = {name: i for i, name in enumerate(_MERGED)}


def _priority_key(name: str):
    if name in _PLAN_CHANGED:
        # After never-verified (round 0), before every verified round.
        return (0.5, _PLAN_CHANGED.index(name))
    return (_LAST.get(name, 0), _REG_POS[name])


ALL_QUERIES: dict[str, tuple] = {
    name: _MERGED[name] for name in sorted(_MERGED, key=_priority_key)
}

# Guard: the streaming sessionize/window/distinct queries must answer
# the SAME question as their batch twins — they share one oracle string
# by construction, and an edit that decouples them should fail loudly
# here, not silently weaken the streaming check (VERDICT r2 item 8).
for _batch, _streaming in [
    ("events_sessionize", "events_sessionize_stateful"),
    ("events_window", "events_window_streaming"),
    ("bloom_dedup", "bloom_dedup_streaming"),
    ("dedup_lsh_screen", "dedup_lsh_screen_streaming"),
    ("events_attribution", "events_attribution_streaming"),
    ("corpus_upsert", "corpus_upsert_streaming"),
    ("ivf_upsert_assign", "ivf_upsert_assign_streaming"),
    # index round-trip is identity: the persisted-and-reread quantizer
    # must answer the same question as the in-session one.
    ("ivf_upsert_assign", "ivf_index_roundtrip"),
    ("dedup_lsh_screen", "lsh_index_roundtrip"),
    ("bloom_dedup", "bloom_index_roundtrip"),
    # merged index shards == the one-shot index (distinct-of-union):
    ("dedup_lsh_screen", "lsh_index_merge"),
    ("quality_classifier", "quality_classifier_streaming"),
    ("sentence_screen", "sentence_screen_streaming"),
    ("pq_codes_upsert", "pq_codes_upsert_streaming"),
    ("boilerplate_screen", "boilerplate_screen_streaming"),
    ("dsir_score", "dsir_score_streaming"),
    ("bm25_route", "bm25_route_streaming"),
    ("bm25_route", "bm25_index_roundtrip"),
    ("decontaminate_scrub", "decontaminate_scrub_streaming"),
    ("decontaminate_fuzzy", "decontaminate_fuzzy_canonical"),
    ("events_anomaly", "events_anomaly_streaming"),
    ("quality_classifier_learned", "quality_classifier_learned_streaming"),
    ("image_screen", "image_screen_streaming"),
    ("image_screen", "image_index_roundtrip"),
    ("dup_labels_upsert", "dup_labels_upsert_streaming"),
    ("dup_labels_upsert", "dup_labels_roundtrip"),
    ("semantic_dedup_learned", "semantic_cells_roundtrip"),
    ("decontaminate_semantic", "decon_cells_roundtrip"),
    # salted_join is a physical-plan rewrite only — same answer, same
    # oracle string as the unsalted plan.
    ("tpch_q5", "tpch_q5_skewed"),
]:
    if _batch in ALL_QUERIES and _streaming in ALL_QUERIES:
        assert ALL_QUERIES[_batch][1] == ALL_QUERIES[_streaming][1], (
            f"{_streaming} oracle diverged from {_batch}; batch and "
            "streaming twins must share one oracle string"
        )
