"""Capture `.explain("formatted")` for named queries into plans/r<N>/
(N = latest git-tracked round + 1, the round being built).

Usage: python scripts/capture_plans.py <suffix> <query> [<query> ...]
       python scripts/capture_plans.py <suffix> --timed <query> ...

Writes plans/r14/<query>_<suffix>.txt (suffix = before|after). With
--timed, additionally runs each query once through the noop sink and
prints the wall time (single run — for quick A/B sanity only; the
committed numbers come from bench.py's min-of-2).

Same session shape as bench.py (local[$SPARK_GRAFT_CPUS], shuffle
partitions = cpus, UI off) so the captured plans are the bench's plans.
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
    suffix = sys.argv[1]
    args = sys.argv[2:]
    timed = "--timed" in args
    names = [a for a in args if not a.startswith("--")]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from pathlib import Path

    from cir_duplicate_detector_spark.plans import _latest_tracked_round

    repo = Path(__file__).resolve().parents[1]
    rnd = (_latest_tracked_round(repo) or 0) + 1
    out_dir = str(repo / "plans" / f"r{rnd}")
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark(
        app_name="cir-dup-spark-plans",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_confs={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        fn, _ = ALL_QUERIES[name]
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"# wrote {path} ({len(plan)} chars)", file=sys.stderr)
        if timed:
            release_cached(spark, gc=True)
            spark.sparkContext.setJobDescription(name)
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            print(
                f"# {name}: {time.perf_counter() - t0:.3f}s (single run)",
                file=sys.stderr,
            )
            spark.sparkContext.setJobDescription(None)
        release_cached(spark, gc=False)
    spark.stop()


if __name__ == "__main__":
    main()
