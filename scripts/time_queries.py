"""Min-of-N noop-sink timing for named queries — the bench's exact
methodology (warmup query, release_cached between runs, System.gc per
query) without the full 196-query sweep. For A/B work during
optimization rounds; committed numbers still come from bench.py.

Usage: python scripts/time_queries.py [--runs N] <query> [<query> ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from cir_duplicate_detector_spark.cache import release_cached  # noqa: E402
from cir_duplicate_detector_spark.plans import ALL_QUERIES  # noqa: E402
from cir_duplicate_detector_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    runs = 2
    if args and args[0] == "--runs":
        runs = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="cir-dup-spark-time",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_confs={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for name in args:
        fn, _ = ALL_QUERIES[name]
        best = None
        per = []
        for _ in range(runs):
            spark.sparkContext.setJobDescription(name)
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            per.append(dt)
            best = dt if best is None else min(best, dt)
            release_cached(spark, gc=False)
        spark.sparkContext._jvm.System.gc()
        runs_s = "/".join(f"{d:.3f}" for d in per)
        print(f"# {name}: min {best:.3f}s (runs {runs_s})", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
