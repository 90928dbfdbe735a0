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

# Front of the line (the driver verifies the FIRST 50 entries), round 5:
# (a) 22 queries with NO driver row ever: dedup_containment_canonical
#     and curation_pipeline landed at registry positions 70/90 in round
#     4 (outside its window — r4 verdict item 1); tpch_q5_skewed,
#     bigram_novelty, domain_mixture, shard_assign, events_attribution,
#     events_attribution_streaming, cms_heavy_hitters, tfidf_topterms,
#     events_quantiles_hist, events_dedup_watermarked, dataset_split
#     (leakage-safe cluster-level split), docs_csv_roundtrip and
#     kmeans_embeddings, corpus_drift, events_rolling, corpus_upsert and
#     multimodal_audio, minhash_recall, events_pivot and ann_recall_ivf are new this
#     round;
# (b) 13 queries whose PLANS changed this round: detect_duplicates
#     (cascaded short-circuit Hamming predicate in the naive scan),
#     semantic_dedup (√N-scaled centroid modulus, results change with
#     it), distinct_kmv (phase-1 bottom-k is now a spillable window),
#     and the six df_capped consumers (the hot-key anti-join no longer
#     forces a broadcast): dedup_containment, doc_topk_similar,
#     dedup_ngram_jaccard, substring_dup, decontaminate,
#     dedup_incremental;
# (c) the 11 reference-core queries whose last driver row is round 3
#     (they ceded their round-4 slots to the then-new extension set);
# (d) 4 extension queries whose last driver row is round 2/3 (registry
#     positions 61-92 in round 4's ordering). Twenty-six r2/r3-green
#     queries cede their slots to (a)/(b): rollup_orders, window_topn,
#     events_distinct_users, events_distinct_users_streaming,
#     events_quantiles, dup_overlap, tpch_q20_like, tpch_q16_like,
#     tpch_q15_like, tpch_q2_like, tpch_q9_like, tpch_q11_like, tpch_q21_like, tpch_q19_like, tpch_q17_like, tpch_q8_like, tpch_q7_like,
#     events_funnel, knn_pq_adc, knn_cosine_ivf, knn_cosine_lsh,
#     knn_cosine_bruteforce, url_domain_stats, doc_chunks, dedup_simhash,
#     dedup_simhash_pairs —
#     never-verified and plan-changed queries outrank
#     stale-green ones for driver slots. They and the 44 round-4-green
#     queries follow past entry 50 in registry order, all covered by
#     the uncapped local parity suite every round.
_PRIORITY = [
    # (a) never driver-verified
    "dedup_containment_canonical",
    "curation_pipeline",
    "tpch_q5_skewed",
    "bigram_novelty",
    "domain_mixture",
    "shard_assign",
    "events_attribution",
    "events_attribution_streaming",
    "cms_heavy_hitters",
    "tfidf_topterms",
    "events_quantiles_hist",
    "events_dedup_watermarked",
    "dataset_split",
    "docs_csv_roundtrip",
    "kmeans_embeddings",
    "corpus_drift",
    "events_rolling",
    "corpus_upsert",
    "multimodal_audio",
    "minhash_recall",
    "events_pivot",
    "ann_recall_ivf",
    # (b) plan changed this round — includes the four streaming queries
    #     whose file staging (stage_source directory support) and, for
    #     sessionize, micro-batch protocol changed late in the round
    "events_sessionize_stateful",
    "events_window_streaming",
    "bloom_dedup_streaming",
    "events_distinct_users_streaming",
    "detect_duplicates",
    "semantic_dedup",
    "distinct_kmv",
    "dedup_containment",
    "doc_topk_similar",
    "dedup_ngram_jaccard",
    "substring_dup",
    "decontaminate",
    "dedup_incremental",
    # (c) reference core, last driver row round 3
    "url_normalize",
    "url_duplicates",
    "url_duplicates_probed",
    "hash_explode_dedup",
    "hash_decode",
    "pdq_pairs",
    "pdq_duplicates_naive",
    "pdq_duplicates_banded",
    "pdq_duplicates_probed",
    "pdq_duplicates_t08_probed",
    "pdq_duplicates_t08_probe30",
    # (d) extensions, last driver row round 2/3
    "dedup_exact",
    "dedup_exact_normalized",
    "dedup_exact_streaming",
    "docs_jsonl_roundtrip",
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
    ("events_attribution", "events_attribution_streaming"),
    # salted_join is a physical-plan rewrite only — same answer, same
    # oracle string as the unsalted plan.
    ("tpch_q5", "tpch_q5_skewed"),
]:
    if _batch in ALL_QUERIES and _streaming in ALL_QUERIES:
        assert ALL_QUERIES[_batch][1] == ALL_QUERIES[_streaming][1], (
            f"{_streaming} oracle diverged from {_batch}; batch and "
            "streaming twins must share one oracle string"
        )
