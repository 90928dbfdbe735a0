"""Round-12 forensic min-merge (VERDICT r11 item 1).

~19-33 rows drifted 1.3-2.0x between the r10 and r11 BENCH_FULL maps
with unchanged plan fingerprints. Protocol: a clean idle-machine full
sweep re-times everything; then, per query,

* sweep <= 1.3x the r10 value  -> the drift was environment noise:
  adopt min(sweep, r11, r10) (the verdict's "min-merged back down");
* sweep still > 1.3x over r10  -> flag it (named cause in SCALE.md or
  a fix; do NOT silently keep the best historical number for a row
  that reproducibly regressed).

Queries without an r10 entry min-merge against r11 only; brand-new
queries keep their sweep value.

Usage: python scripts/bench_merge.py <sweep_BENCH_FULL.json> \
           <r10_map.json> <r11_map.json>
Writes the merged map over repo BENCH_FULL.json and prints the flags.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

# Resolve relative __file__ (e.g. invoked as `python scripts/
# bench_merge.py` from the repo root) instead of string-splitting an
# assumed-absolute path, which silently wrote the merged artifact to
# scripts/BENCH_FULL.json (ADVICE r12).
REPO_FULL = str(Path(__file__).resolve().parents[1] / "BENCH_FULL.json")


def main() -> None:
    sweep_path, r10_path, r11_path = sys.argv[1:4]
    with open(sweep_path) as f:
        sweep_doc = json.load(f)
    sweep = sweep_doc["queries"]
    with open(r10_path) as f:
        r10 = json.load(f)["queries"]
    with open(r11_path) as f:
        r11 = json.load(f)["queries"]

    # A partial sweep must not silently delete rows from the artifact
    # (review r12): every query the previous round measured has to be
    # in the sweep, or the merge aborts and names the gap.
    missing = sorted(set(r11) - set(sweep))
    if missing:
        raise SystemExit(
            f"sweep is missing {len(missing)} queries present in the "
            f"r11 artifact (partial run?): {missing[:10]}..."
        )

    merged: dict[str, float] = {}
    flagged: list[tuple[str, float, float]] = []
    recovered = 0
    for name, t in sweep.items():
        cands = [t]
        if name in r11:
            cands.append(r11[name])
        if name in r10:
            if t > 1.3 * r10[name]:
                flagged.append((name, r10[name], t))
                # keep the best of THIS round's evidence (sweep vs r11)
                # but never reach back to an r10 number the clean sweep
                # could not reproduce.
                merged[name] = round(min(cands), 3)
                continue
            cands.append(r10[name])
            if r11.get(name, 0) > 1.3 * r10[name]:
                recovered += 1
        merged[name] = round(min(cands), 3)

    sweep_doc["queries"] = merged
    ref = sorted(
        n for n in merged if n.startswith(("ref30k_", "ref300k_"))
    )
    ref_total = round(sum(merged[n] for n in ref), 3)
    per_sf = round(sum(v for n, v in merged.items() if n not in ref), 3)
    sweep_doc["value"] = per_sf
    sweep_doc["sum_all_queries"] = round(per_sf + ref_total, 3)
    sweep_doc["value_excludes"]["excluded_total"] = ref_total
    with open(REPO_FULL, "w") as f:
        json.dump(sweep_doc, f, indent=1, sort_keys=True)

    print(f"merged {len(merged)} queries; per-sf total {per_sf}s")
    print(f"r11-drifted rows recovered by the clean sweep: {recovered}")
    if flagged:
        print("STILL >1.3x over r10 on the clean sweep (need named cause):")
        for name, p, t in sorted(flagged, key=lambda x: -x[2] / x[1]):
            print(f"  {name}: r10={p:.3f}s sweep={t:.3f}s ({t / p:.2f}x)")
    else:
        print("no rows remain >1.3x over their r10 value")


if __name__ == "__main__":
    main()
