"""Second point on the growth curve for the flagship SERVING rows
(round 13, VERDICT r12 item 7): the 100 TB claim extrapolated from ONE
10x measurement; this script derives a 100x replica (documents +
embeddings only — the two tables the serving rows read) and re-times
just the fixed-probe serving queries, writing ``BENCH_100X.json`` with
sf0.1 / 10x / 100x columns and growth ratios.

Replica id plan: the 10x layout generalized — copy ``i`` lives at
``id + i * 10_000_000`` (every provided-scale id is < 10M, so copies
never collide and ``id % 10_000_000`` recovers the original id — the
same modulus the round-12 probe-band fix keys on, so probe fractions
stay scale-invariant by construction). Replication is ONE broadcast
crossJoin against ``range(n)``, not an n-way union (an n-deep union
tree costs O(n) analysis time at n=100).

Selection: the serving rows whose 100 TB posture is "index built once
per snapshot, per-query cost fixed-probe" — `dedup_lsh_screen_streaming`
(persisted LSH band screen), `dup_labels_upsert` (label-table wave
upsert), `knn_ivf_pq` (persisted IVF-PQ probe), `bm25_route`
(persisted-stats percolation). min-of-3 per query; the first run warms
the per-(app, dir) shared index artifacts, so the min reflects the
serving clock exactly as BENCH_FULL/BENCH_10X do.

Usage: python scripts/bench_100x.py [n] [runs] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = "/root/testdata/sf0.1"
REPLICA_DIR = "/tmp/scale_replica_wide"
ID_BLOCK = 10_000_000

SERVING_QUERIES = [
    "dedup_lsh_screen_streaming",
    "dup_labels_upsert",
    "knn_ivf_pq",
    "bm25_route",
    # The registered knn_ivf_pq row probes `vec_id % 100 = 0` — a panel
    # that GROWS with the corpus (20 probes at sf0.1 → 2000 at 100x),
    # so its growth ratio measures probe volume, not serving
    # degradation (predicted work ratio probes×nprobe×cellsize×M =
    # 31.6x at 100x/10x; measured 27.4x — the engine tracks the math
    # sublinearly). The REGISTERED fixed-panel twin is the SERVING
    # claim proper: the same persisted-index probe path under a fixed
    # 32-probe panel at every scale (~flat, 3.66 → 3.18 → 5.21 s).
    "knn_ivf_pq_served32",
]


def build_wide_replica(spark, n: int) -> str:
    from pyspark.sql import functions as F

    out = f"{REPLICA_DIR}_{n}x"
    for table, key in [("documents", "doc_id"), ("embeddings", "vec_id")]:
        # Gate on the _SUCCESS marker (the ADVICE r12 stance): a crash
        # mid-write leaves the dir without it, and mode("overwrite")
        # repairs rather than half-trusts.
        if os.path.isfile(f"{out}/{table}.parquet/_SUCCESS"):
            continue
        src = spark.read.parquet(f"{SRC}/{table}.parquet")
        reps = F.broadcast(
            spark.range(n).select(F.col("id").alias("__rep"))
        )
        wide = src.crossJoin(reps).withColumn(
            key, F.col(key) + F.col("__rep") * ID_BLOCK
        )
        if table == "documents":
            # Per-copy perturbation (VERDICT r13 item 3) — same rule
            # as the 10x replica, so both growth points measure the
            # engine, not the copies' duplicate density.
            from replica_bench import perturb_text

            wide = wide.withColumn(
                "text", perturb_text(F.col("text"), F.col("__rep"))
            )
        (
            wide.drop("__rep")
            .repartition(32)
            .write.mode("overwrite")
            .parquet(f"{out}/{table}.parquet")
        )
    return out


def main() -> None:
    sys.path.insert(0, REPO)
    from cir_duplicate_detector_spark.cache import release_cached
    from cir_duplicate_detector_spark.plans import ALL_QUERIES
    from cir_duplicate_detector_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    names = sys.argv[3:] or SERVING_QUERIES

    with open(os.path.join(REPO, "BENCH_FULL.json")) as f:
        full = json.load(f)["queries"]
    x10 = {}
    try:
        with open(os.path.join(REPO, "BENCH_10X.json")) as f:
            x10 = json.load(f)["queries"]
    except (OSError, json.JSONDecodeError):
        pass

    spark = get_spark(
        app_name="bench-100x",
        master="local[32]",
        shuffle_partitions=32,
        extra_confs={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    replica = build_wide_replica(spark, n)
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    out: dict[str, dict] = {}
    art_path = os.path.join(REPO, "BENCH_100X.json")
    try:
        with open(art_path) as f:
            out = json.load(f).get("queries", {})
    except (OSError, json.JSONDecodeError):
        pass
    for name in names:
        fn = ALL_QUERIES[name][0]
        best = None
        for _ in range(runs):
            t0 = time.perf_counter()
            fn(spark, replica).write.format("noop").mode(
                "overwrite"
            ).save()
            t = time.perf_counter() - t0
            best = t if best is None else min(best, t)
            release_cached(spark, gc=False)
        spark.sparkContext._jvm.System.gc()
        g10 = x10.get(name, {}).get("x10_s")
        out[name] = {
            "sf01_s": full.get(name),
            "x10_s": g10,
            "x100_s": round(best, 2),
            "growth_vs_sf01": (
                round(best / full[name], 2) if full.get(name) else None
            ),
            "growth_vs_10x": round(best / g10, 2) if g10 else None,
            "runs": runs,
        }
        print(
            f"# {name}: sf0.1={full.get(name)}s 10x={g10}s"
            f" -> 100x={best:.2f}s",
            file=sys.stderr,
        )
        with open(art_path, "w") as f:
            json.dump(
                {
                    "replica": f"{n}x documents/embeddings, copy i at"
                    f" id + i*{ID_BLOCK} (bench_100x.build_wide_replica)",
                    "rule": "fixed-probe serving rows only (VERDICT r12"
                    " item 7): index built once per snapshot, per-query"
                    " cost should be ~probe-volume-linear",
                    "runs_per_query": runs,
                    "queries": out,
                },
                f,
                indent=1,
                sort_keys=True,
            )
    spark.stop()
    print(
        json.dumps(
            {
                "bench_100x": {
                    q: v["growth_vs_10x"] for q, v in out.items()
                }
            }
        )
    )


if __name__ == "__main__":
    main()
