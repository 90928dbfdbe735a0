"""Query registry exposed through ``__spark_entry__``.

``ALL_QUERIES``: name -> (spark_callable(spark, sf_dir) -> DataFrame,
duckdb_oracle_sql | None).

Ordering is deliberate: the correctness driver cross-checks the FIRST
50 registry entries against the DuckDB oracle (round 2 verified entries
0-49 and skipped the rest), so queries that have never had a driver-
recorded green row — plus anything whose plan changed this round — are
registered first. Every query is additionally covered by the local
parametric parity suite (`tests/test_oracle_parity.py`), which has no
cap; the priority list only controls which subset the driver's
independent gate re-verifies this round.
"""

from __future__ import annotations

from .core_queries import CORE_QUERIES

_MERGED: dict[str, tuple] = {}
_MERGED.update(CORE_QUERIES)

try:  # extension registries appear as they are built
    from .extension_queries import EXTENSION_QUERIES

    _MERGED.update(EXTENSION_QUERIES)
except ImportError:
    pass

# Front of the line (the driver verifies the FIRST 50 entries):
# (a) the 30 queries with no round-3 driver row (they were green in
#     round 2 and in the uncapped local parity suite, but rotate to the
#     front so every registered query has a fresh driver-green row),
# (b) the two round-3 hash-mismatch fixes (oracle ::BIGINT casts),
# (c) queries whose PLANS changed between rounds 3 and 4: the jaccard
#     candidate pipeline gained a size-gated broadcast (dedup_minhash,
#     dup_clusters, cluster_representatives) and the inverted-index
#     family gained a document-frequency hot-key cap (dedup_containment,
#     doc_topk_similar, dedup_ngram_jaccard; substring_dup is in (a)),
# (e) the 11 queries NEW in round 4 — never driver-verified,
# (d) one reference-core flagship (driver-green in round 3; the rest of
#     the core set ceded its slots to (e)). Everything past entry 50
#     follows in registry order — all of it driver-green in r2/r3 and
#     covered by the uncapped local parity suite every round.
_PRIORITY = [
    # (a) no round-3 driver row
    "embedding_near_dup",
    "text_quality",
    "token_count",
    "lang_id",
    "doc_fingerprint",
    "substring_dup",
    "corpus_curation",
    "pii_redact",
    "ngram_topk",
    "stratified_sample",
    "dedup_incremental",
    "multimodal_features",
    "multimodal_frames",
    "multimodal_resize",
    "events_window",
    "events_window_streaming",
    "events_sessionize",
    "events_sessionize_stateful",
    "events_asof",
    "events_json",
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "tpch_q6",
    "tpch_q18",
    "tpch_q10",
    "tpch_q13",
    "tpch_q14",
    "tpch_q22_like",
    "tpch_q4_like",
    # (b) round-3 red rows, oracles fixed this round
    "tpch_q12_like",
    "corpus_stats_cube",
    # (c) plan-changed last round
    "dedup_minhash",
    "dup_clusters",
    "cluster_representatives",
    "dedup_containment",
    "doc_topk_similar",
    "dedup_ngram_jaccard",
    # (e) NEW this round (round 4) — never driver-verified
    "decontaminate",
    "semantic_dedup",
    "distinct_kmv",
    "bloom_dedup",
    "chunk_dedup",
    "token_budget_sample",
    "quality_band",
    "bloom_dedup_streaming",
    "doc_repetition",
    "pack_sequences",
    "ann_recall_lsh",
    # (d) reference core (all driver-green in round 3; the tail of the
    # core set cedes its slots to the new round-4 queries — the driver
    # verifies the FIRST 50 entries only)
    "detect_duplicates",
]

ALL_QUERIES: dict[str, tuple] = {
    name: _MERGED[name] for name in _PRIORITY if name in _MERGED
}
ALL_QUERIES.update(
    {name: v for name, v in _MERGED.items() if name not in ALL_QUERIES}
)

# Guard: the streaming sessionize/window/distinct queries must answer
# the SAME question as their batch twins — they share one oracle string
# by construction, and an edit that decouples them should fail loudly
# here, not silently weaken the streaming check (VERDICT r2 item 8).
for _batch, _streaming in [
    ("events_sessionize", "events_sessionize_stateful"),
    ("events_window", "events_window_streaming"),
    ("bloom_dedup", "bloom_dedup_streaming"),
    # salted_join is a physical-plan rewrite only — same answer, same
    # oracle string as the unsalted plan.
    ("tpch_q5", "tpch_q5_skewed"),
]:
    if _batch in ALL_QUERIES and _streaming in ALL_QUERIES:
        assert ALL_QUERIES[_batch][1] == ALL_QUERIES[_streaming][1], (
            f"{_streaming} oracle diverged from {_batch}; batch and "
            "streaming twins must share one oracle string"
        )
