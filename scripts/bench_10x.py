"""Machine-checkable growth artifact (round-6 verdict stretch item 7):
re-time the slowest registered queries against the 10x synthetic
replica (`replica_bench.build_replica` — documents/embeddings/events
replicated with per-copy id offsets; document copies per-copy
perturbed since round 14, so near-dup families stay within-copy and
growth measures the engine) with min-of-3 per query, and write ``BENCH_10X.json`` pairing
each 10x number with its sf0.1 entry from ``BENCH_FULL.json``. SCALE.md
's growth narrative points at this artifact instead of hand-copied
prose tables.

Selection rule (stable as the registry grows): the N slowest
``BENCH_FULL.json`` entries, excluding ``ref30k_*`` (fixed-scale
baseline points) and ``tpch_*``/analytics names (their tables are not
replicated, so a "10x" timing would be flat and misleading). Run AFTER
``bench.py`` so the selection sees this round's timings.

Usage: python scripts/bench_10x.py [n_slowest] [runs] [query ...]
Explicit query names override the slowest-N selection (chunked runs);
results MERGE into an existing BENCH_10X.json so chunks accumulate.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Queries whose input tables the replica does NOT scale (TPC-H relations
# and their analytics derivatives) — a flat timing there is noise, not a
# growth row. ref30k_* always runs at its own fixed corpus size.
EXCLUDED_PREFIXES = ("ref30k_", "tpch_")
EXCLUDED_NAMES = {"rollup_orders", "window_topn", "dup_overlap"}


def main() -> None:
    sys.path.insert(0, REPO)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from replica_bench import build_replica

    from cir_duplicate_detector_spark.cache import release_cached
    from cir_duplicate_detector_spark.plans import ALL_QUERIES
    from cir_duplicate_detector_spark.session import get_spark

    n_slowest = int(sys.argv[1]) if len(sys.argv) > 1 else 15
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    with open(os.path.join(REPO, "BENCH_FULL.json")) as f:
        full = json.load(f)["queries"]
    names = sys.argv[3:] or [
        n
        for n in sorted(full, key=lambda n: -full[n])
        if n in ALL_QUERIES
        and not n.startswith(EXCLUDED_PREFIXES)
        and n not in EXCLUDED_NAMES
    ][:n_slowest]

    spark = get_spark(
        app_name="bench-10x",
        master="local[32]",
        shuffle_partitions=32,
        extra_confs={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    replica = build_replica(spark, 10)
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # Merge into an existing artifact so chunked runs accumulate.
    out: dict[str, dict] = {}
    art_path = os.path.join(REPO, "BENCH_10X.json")
    try:
        with open(art_path) as f:
            out = json.load(f).get("queries", {})
    except (OSError, json.JSONDecodeError):
        pass
    for name in names:
        fn, _ = ALL_QUERIES[name]
        best = None
        for _ in range(runs):
            t0 = time.perf_counter()
            fn(spark, replica).write.format("noop").mode("overwrite").save()
            t = time.perf_counter() - t0
            best = t if best is None else min(best, t)
            release_cached(spark, gc=False)
        spark.sparkContext._jvm.System.gc()
        out[name] = {
            "sf01_s": full[name],
            "x10_s": round(best, 2),
            "growth": round(best / full[name], 2) if full[name] else None,
            "runs": runs,
        }
        print(f"# {name}: {full[name]}s -> {best:.2f}s", file=sys.stderr)
        # Flush after every query so an interrupted chunk keeps its
        # completed measurements.
        with open(art_path, "w") as f:
            json.dump(
                {
                    "replica": "10x documents/embeddings/events,"
                    " per-copy id offsets"
                    " (per-copy perturbed text, round 14;"
                    " replica_bench.build_replica)",
                    "rule": f"{n_slowest} slowest BENCH_FULL.json entries"
                    " excl. ref30k_*/tpch_*/analytics-on-unreplicated-tables",
                    "runs_per_query": runs,
                    "queries": out,
                },
                f,
                indent=1,
                sort_keys=True,
            )

    artifact = {
        "replica": "10x documents/embeddings/events, per-copy id offsets"
        " (duplicate-heavy worst case; replica_bench.build_replica)",
        "rule": f"{n_slowest} slowest BENCH_FULL.json entries excl."
        " ref30k_*/tpch_*/analytics-on-unreplicated-tables",
        "runs_per_query": runs,
        "queries": out,
    }
    with open(os.path.join(REPO, "BENCH_10X.json"), "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=True)
    spark.stop()
    print(json.dumps({"bench_10x": {n: v["growth"] for n, v in out.items()}}))


if __name__ == "__main__":
    main()
