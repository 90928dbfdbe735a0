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
    # Round 13. All entries are RESULT-PRESERVING physical/plan-shape
    # edits (oracle strings untouched, local parity green); queued per
    # the fingerprint-lint contract so the driver re-vouches for them.
    #
    # (a) pdq row-time length guard (VERDICT r12 item 4): max_hex_len
    # now defaults to 64 and the chunk-decode path carries a
    # when/raise_error guard instead of trusting lpad truncation — one
    # extra projection in every pdq plan, same rows.
    "pdq_duplicates_naive",
    "pdq_duplicates_banded",
    "pdq_duplicates_probed",
    "pdq_duplicates_t08_probed",
    "pdq_duplicates_t08_probe30",
    "detect_duplicates",
    "dup_overlap",
    # (b) bm25_route's one-row stats crossJoin broadcast-hinted to
    # match its four sibling sites (VERDICT r12 item 6).
    "bm25_route",
    "bm25_index_roundtrip",
    # (bm25_route_streaming's registered plan reads the post-drain
    # memory sink, so the hint is not in its analyzed plan — verified
    # unchanged in the PLANS_r12→r13 diff)
    # (c) shared truth artifacts (VERDICT r12 items 2-3): the OPQ A/B
    # pair serves its exact-L2 shortlist from one parquet
    # (`ext_ann._shared_skewed_truth`), the hybrid recall pair its
    # exact fused top-10 (`ext_pipeline._shared_hybrid_truth`) —
    # bigint ids round-trip parquet exactly; plus (b) reaches
    # hybrid_search_fresh through its stale-idf stage.
    "pq_recall_skewed",
    "pq_recall_skewed_opq",  # also: index built via opq="auto" (item 5)
    "hybrid_recall",
    "hybrid_search_fresh",
    "hybrid_fresh_recall",
    # (d) events_quantiles recomputed from explicit rank selection: the
    # 10x-replica gate caught Spark's percentile (a·(1−g)+g·b) and
    # DuckDB's quantile_cont (a+(b−a)·g) diverging in the last ulp on
    # replicated data; both sides now spell one shared lerp formula.
    # Identical values at every provided scale (tri-scale re-verified)
    # AND at the 10x replica; also moves Spark off the
    # memory-buffering percentile agg.
    "events_quantiles",
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
    f"{_PKG}/plans/__init__.py": "round-13 rotation metadata reset"
    " (cleared round-12 _ROUND_EDITS/_PLAN_CHANGED — all r12 entries"
    " driver-verified and committed); no query plan or result touched",
    f"{_PKG}/operators/pdq.py": (
        "pdq_duplicates_naive",
        "pdq_duplicates_banded",
        "pdq_duplicates_probed",
        "pdq_duplicates_t08_probed",
        "pdq_duplicates_t08_probe30",
        "detect_duplicates",
        "dup_overlap",
    ),  # max_hex_len defaults to 64 (no eager length scan on the
    # common path, VERDICT r12 item 4) + row-time length guard in
    # decoded_hashes — result-preserving, plans re-queued
    f"{_PKG}/__init__.py": (
        "detect_duplicates",
    ),  # detect_duplicates passes the same new max_hex_len=64 default
    # through; result-preserving
    f"{_PKG}/operators/textops.py": (
        "bm25_route",
        "bm25_index_roundtrip",
        "hybrid_search_fresh",
        "hybrid_fresh_recall",
    ),  # broadcast hint on bm25_route's one-row stats crossJoin
    # (VERDICT r12 item 6); physical only, result-preserving
    f"{_PKG}/operators/pq.py": (
        "pq_recall_skewed_opq",
    ),  # NEW opq='never'/'auto'/'always'/'rotate' gate on
    # build_ivf_pq_index + IvfPqIndex.perm/.rot carried through
    # probe/upsert/merge/persist (VERDICT r12 items 5 and 8); default
    # 'never' leaves every other consumer's plan untouched
    f"{_PKG}/operators/opq.py": "NEW opq_subspace_imbalance (the"
    " auto-gate statistic, consumed by build_ivf_pq_index(opq=...)"
    " and the new opq_auto_gate row) + NEW learn_rotation /"
    " apply_rotation (full OPQ, VERDICT r12 stretch item 8 — library"
    " operator with unit-test evidence; the Procrustes SVD is not"
    " oracle-expressible, so no registered query consumes it; its"
    " bounded-sample collect carries the audited hygiene pragma)",
    f"{_PKG}/plans/ext_ann.py": (
        "pq_recall_skewed",
        "pq_recall_skewed_opq",
        "opq_auto_gate",
        "knn_ivf_pq_served32",
    ),  # shared exact-L2 truth parquet for the A/B pair (VERDICT r12
    # item 2), B row rebuilt on the opq='auto' path (item 5 — oracle
    # unchanged, proving the gate end-to-end), NEW opq_auto_gate row
    f"{_PKG}/plans/ext_pipeline.py": (
        "hybrid_recall",
        "hybrid_fresh_recall",
    ),  # shared all-exact hybrid truth parquet (VERDICT r12 item 3);
    # both rows still CALL q_hybrid_search inside the builder
    f"{_PKG}/plans/extension_queries.py": "round-13 _ORDER addition"
    " for the new opq_auto_gate / knn_ivf_pq_served32 registrations"
    " only; no existing query touched",
    f"{_PKG}/plans/ext_events.py": (
        "events_quantiles",
    ),  # explicit rank-selected lerp on both engines (10x gate catch —
    # see _PLAN_CHANGED); tri-scale + 10x re-verified green
    f"{_PKG}/cache.py": "tracked_mkdtemp bounded to one live dir per"
    " roundtrip family + shared_artifact stale-app sweep over ALL"
    " registered family caches (ADVICE r12); lifecycle only, no query"
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
