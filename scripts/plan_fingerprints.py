"""Write ``PLANS_r<N>.json``: canonical logical-plan fingerprints for
every registered query (round-11, VERDICT r10 item 2 — make the
``_ROUND_EDITS`` "results unchanged" prose machine-checkable).

Each query's plan is built TWICE in two fresh Spark sessions at
sf0.001; a query whose canonical fingerprint differs across sessions
is recorded ``VOLATILE:<fp1>:<fp2>`` and skipped by the lint (no
stable signal — e.g. a plan that embeds a per-session staging order).
Build errors record ``ERR:<type>`` rather than aborting the sweep.

N defaults to (latest git-TRACKED CORRECTNESS round) + 1 — the round
currently being built, matching the ``_ROUND_EDITS`` diff base.

Usage: python scripts/plan_fingerprints.py [round] [query ...]
Explicit query names re-fingerprint just those and MERGE into an
existing artifact (for iterating late in a round).
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = "/root/testdata/sf0.001"


def main() -> None:
    sys.path.insert(0, REPO)
    from cir_duplicate_detector_spark.plans import (
        ALL_QUERIES,
        _latest_tracked_round,
    )
    from cir_duplicate_detector_spark.plans.fingerprint import (
        plan_fingerprint,
    )
    from cir_duplicate_detector_spark.session import get_spark
    from pathlib import Path

    if len(sys.argv) > 1:
        rnd = int(sys.argv[1])
    else:
        rnd = (_latest_tracked_round(Path(REPO)) or 0) + 1
    names = sys.argv[2:] or list(ALL_QUERIES)
    unknown = [n for n in names if n not in ALL_QUERIES]
    if unknown:  # fail fast, before any session pays a sweep
        sys.exit(f"unknown query name(s): {unknown}")

    runs: list[dict[str, str]] = []
    for i in range(2):
        spark = get_spark(
            app_name=f"plan-fp-{i}",
            master="local[8]",
            shuffle_partitions=8,
            extra_confs={"spark.ui.enabled": "false"},
        )
        spark.sparkContext.setLogLevel("ERROR")
        fps: dict[str, str] = {}
        for name in names:
            fn, _ = ALL_QUERIES[name]
            try:
                fps[name] = plan_fingerprint(fn(spark, SF_DIR))
            except Exception as ex:  # record, don't abort the sweep
                fps[name] = f"ERR:{type(ex).__name__}"
            print(f"# s{i} {name}: {fps[name]}", file=sys.stderr)
        runs.append(fps)
        spark.stop()

    out_path = os.path.join(REPO, f"PLANS_r{rnd:02d}.json")
    merged: dict[str, str] = {}
    try:
        with open(out_path) as f:
            merged = json.load(f)["fingerprints"]
    except (OSError, json.JSONDecodeError, KeyError):
        pass
    for name in names:
        a, b = runs[0][name], runs[1][name]
        merged[name] = a if a == b else f"VOLATILE:{a}:{b}"
    # A FULL sweep defines the artifact completely: prune fingerprints
    # of queries no longer registered, or a renamed/removed query's
    # ghost entry would ride every later artifact and skew the
    # cross-round lint's record.
    if not sys.argv[2:]:
        merged = {n: v for n, v in merged.items() if n in ALL_QUERIES}

    with open(out_path, "w") as f:
        json.dump(
            {
                "round": rnd,
                "sf_dir": SF_DIR,
                "canon": "analyzed plan; #ids, lambda x_<digits>,"
                " hex-suffixed names, /tmp paths, @objhash normalized"
                " (plans/fingerprint.canonical_plan)",
                "fingerprints": dict(sorted(merged.items())),
            },
            f,
            indent=1,
        )
    vol = [n for n, v in merged.items() if v.startswith("VOLATILE")]
    err = [n for n, v in merged.items() if v.startswith("ERR")]
    print(
        json.dumps(
            {
                "plans": out_path,
                "n": len(merged),
                "volatile": vol,
                "err": err,
            }
        )
    )


if __name__ == "__main__":
    main()
