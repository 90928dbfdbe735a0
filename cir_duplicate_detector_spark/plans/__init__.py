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

# Front of the line: (a) the 18 queries the round-2 driver never
# reached (positions 50-67), (b) queries new or plan-changed in round 3
# (DataFrame probe sets, materialize lifetime, t=0.8 operating point),
# (c) the reference-core workload. Everything else follows in its
# registry order.
_PRIORITY = [
    # (a) never driver-verified before round 3
    "tpch_q7_like",
    "tpch_q8_like",
    "tpch_q12_like",
    "tpch_q17_like",
    "tpch_q19_like",
    "tpch_q21_like",
    "tpch_q2_like",
    "tpch_q9_like",
    "tpch_q11_like",
    "tpch_q15_like",
    "tpch_q16_like",
    "tpch_q20_like",
    "events_distinct_users",
    "events_distinct_users_streaming",
    "events_quantiles",
    "dup_overlap",
    "rollup_orders",
    "window_topn",
    # (b) new / plan-changed this round (dup_clusters before
    # cluster_representatives: they share the minhash+CC subplan, so
    # the cheaper query pays the one-time codegen in the bench)
    "pdq_duplicates_t08_probed",
    "pdq_duplicates_t08_probe30",
    "dup_clusters",
    "cluster_representatives",
    "knn_pq_adc",
    "dedup_exact_normalized",
    "dedup_exact_streaming",
    "url_domain_stats",
    "doc_chunks",
    "docs_jsonl_roundtrip",
    "corpus_stats_cube",
    "doc_topk_similar",
    "events_funnel",
    "url_duplicates_probed",
    "pdq_duplicates_probed",
    "knn_cosine_bruteforce",
    "knn_cosine_lsh",
    "knn_cosine_ivf",
    "dedup_minhash",
    "dup_clusters",
    # (c) reference core
    "detect_duplicates",
    "url_normalize",
    "url_duplicates",
    "hash_explode_dedup",
    "hash_decode",
    "pdq_pairs",
    "pdq_duplicates_naive",
    "pdq_duplicates_banded",
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
]:
    if _batch in ALL_QUERIES and _streaming in ALL_QUERIES:
        assert ALL_QUERIES[_batch][1] == ALL_QUERIES[_streaming][1], (
            f"{_streaming} oracle diverged from {_batch}; batch and "
            "streaming twins must share one oracle string"
        )
