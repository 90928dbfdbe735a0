"""Synthetic scale-up harness: replicate the sf0.1 testdata Nx (default
10x) into a parquet dir and time registered queries against it.

This is the reproducible form of SCALE.md's "Measured scale-up" table:
each replica copy offsets doc_id/vec_id by i*10^7 so ids stay unique
AND the derived-corpus bands (+1e6/+2e6) stay inside their copy's block.
Every text/embedding therefore appears N times — a deliberately
duplicate-heavy corpus, which makes the output-tracking operators
(near-dup joins) show their worst growth case, not their best.

Usage:
    python scripts/replica_bench.py [N] [query ...]
    # default N=10, queries = the round's new-operator set
"""

from __future__ import annotations

import sys
import time

REPLICA_DIR = "/tmp/scale_replica"
SRC = "/root/testdata/sf0.1"

DEFAULT_QUERIES = [
    "decontaminate",
    "semantic_dedup",
    "distinct_kmv",
    "bloom_dedup",
    "chunk_dedup",
    "token_budget_sample",
    "quality_band",
    "doc_repetition",
    "pack_sequences",
    "ann_recall_lsh",
]


def build_replica(spark, n: int) -> str:
    from pyspark.sql import functions as F

    out = f"{REPLICA_DIR}_{n}x"
    for table, key in [
        ("documents", "doc_id"),
        ("embeddings", "vec_id"),
        ("events", "event_id"),
    ]:
        src = spark.read.parquet(f"{SRC}/{table}.parquet")
        parts = [
            src.withColumn(key, F.col(key) + F.lit(i * 10_000_000))
            for i in range(n)
        ]
        df = parts[0]
        for p in parts[1:]:
            df = df.unionAll(p)
        df.repartition(32).write.mode("overwrite").parquet(
            f"{out}/{table}.parquet"
        )
    return out


def main() -> None:
    sys.path.insert(0, "/root/repo")
    from cir_duplicate_detector_spark.cache import release_cached
    from cir_duplicate_detector_spark.plans import ALL_QUERIES
    from cir_duplicate_detector_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    names = sys.argv[2:] or DEFAULT_QUERIES

    spark = get_spark(
        app_name="scale-replica-bench",
        master="local[32]",
        shuffle_partitions=32,
        extra_confs={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = build_replica(spark, n)
    print(f"# replica at {sf_dir}", file=sys.stderr)

    for name in names:
        fn, _ = ALL_QUERIES[name]
        start = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        elapsed = time.perf_counter() - start
        print(f"{name}\t{elapsed:.1f}s")
        release_cached(spark, gc=False)
        spark.sparkContext._jvm.System.gc()
    spark.stop()


if __name__ == "__main__":
    main()
