"""Shared-session bench forensics (round-6, VERDICT r5 item 1).

Reproduces the compact-line anomaly — `dedup_exact_streaming` 13.0 s /
`pdq_duplicates_t08_probed` 7.3 s in the shared bench JVM vs 1.2 s /
1.8 s fresh-session — by re-timing the two suspect queries at
checkpoints while the session accumulates exactly the kinds of state
the bench accumulates:

  phase 0: fresh session              -> baseline timing
  phase 1: + all OTHER streaming queries (x2 runs each, bench protocol)
  phase 2: + the pdq/similarity heavy batch set (x2 each)
  phase 3: + the full remaining registry, bench order

After each phase the suspects are re-timed (min-of-2, release_cached +
System.gc between runs — the bench's exact sweep), and JVM code-cache /
heap / loaded-state-store numbers are recorded via jcmd, so whichever
axis moves with the slowdown names the cause.

Run:  python scripts/bench_forensics.py [sf_dir]
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cir_duplicate_detector_spark.cache import release_cached
from cir_duplicate_detector_spark.plans import ALL_QUERIES
from cir_duplicate_detector_spark.session import get_spark

SUSPECTS = ["dedup_exact_streaming", "pdq_duplicates_t08_probed"]
STREAMING = [
    "events_window_streaming",
    "events_sessionize_stateful",
    "bloom_dedup_streaming",
    "events_distinct_users_streaming",
    "events_attribution_streaming",
]
HEAVY_BATCH = [
    "detect_duplicates",
    "pdq_duplicates_naive",
    "pdq_duplicates_banded",
    "dedup_minhash",
    "dedup_containment",
    "doc_topk_similar",
    "dedup_ngram_jaccard",
    "minhash_recall",
    "semantic_dedup",
]


def jvm_stats(pid: int) -> dict:
    out = {}
    try:
        cc = subprocess.run(
            ["jcmd", str(pid), "Compiler.codecache"],
            capture_output=True, text=True, timeout=30,
        ).stdout
        out["codecache"] = " | ".join(
            line.strip() for line in cc.splitlines() if "used=" in line
        )
        heap = subprocess.run(
            ["jcmd", str(pid), "GC.heap_info"],
            capture_output=True, text=True, timeout=30,
        ).stdout
        out["heap"] = " | ".join(
            line.strip() for line in heap.splitlines() if "used" in line
        )[:300]
        thr = subprocess.run(
            ["jcmd", str(pid), "Thread.print"],
            capture_output=True, text=True, timeout=30,
        ).stdout
        out["n_threads"] = thr.count('"')  # 2 quotes per thread name line
        out["state_maint_threads"] = thr.count("state-store-maintenance")
    except Exception as e:  # pragma: no cover - diagnostic only
        out["err"] = str(e)
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark(
        app_name="bench-forensics",
        master="local[32]",
        shuffle_partitions=32,
        extra_confs={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    jvm_pid = None
    try:
        jvm_pid = int(
            subprocess.run(
                ["pgrep", "-f", "bench-forensics"],
                capture_output=True, text=True,
            ).stdout.split()[0]
        )
    except Exception:
        pass
    # The Spark JVM is the java child of this python process
    try:
        out = subprocess.run(
            ["pgrep", "-P", str(os.getpid()), "java"],
            capture_output=True, text=True,
        ).stdout.split()
        if out:
            jvm_pid = int(out[0])
    except Exception:
        pass

    def timed(name: str, runs: int = 2) -> float:
        fn, _ = ALL_QUERIES[name]
        best = None
        for _ in range(runs):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            el = time.perf_counter() - t0
            best = el if best is None else min(best, el)
            release_cached(spark, gc=False)
        spark.sparkContext._jvm.System.gc()
        return best

    def checkpoint(label: str) -> None:
        stats = jvm_stats(jvm_pid) if jvm_pid else {}
        sus = {s: round(timed(s), 2) for s in SUSPECTS}
        # count registered temp views (memory sink tables accumulate)
        n_tables = len(spark.catalog.listTables())
        print(
            f"=== {label}: suspects={sus} tables={n_tables} "
            f"threads={stats.get('n_threads')} "
            f"maint={stats.get('state_maint_threads')}\n"
            f"    codecache: {stats.get('codecache')}\n"
            f"    heap: {stats.get('heap')}",
            flush=True,
        )

    checkpoint("phase0 fresh")

    for name in STREAMING:
        t = timed(name)
        print(f"  ran {name}: {t:.2f}s", flush=True)
    checkpoint("phase1 +streaming")

    for name in HEAVY_BATCH:
        if name in ALL_QUERIES:
            t = timed(name)
            print(f"  ran {name}: {t:.2f}s", flush=True)
    checkpoint("phase2 +heavy batch")

    done = set(SUSPECTS + STREAMING + HEAVY_BATCH)
    rest = [n for n in ALL_QUERIES if n not in done]
    for i, name in enumerate(rest):
        t = timed(name)
        print(f"  ran {name}: {t:.2f}s", flush=True)
        if (i + 1) % 25 == 0:
            checkpoint(f"phase3 after {i + 1}/{len(rest)}")
    checkpoint("phase3 full registry")
    spark.stop()


if __name__ == "__main__":
    main()
