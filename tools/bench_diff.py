#!/usr/bin/env python3
"""Noise-aware per-query bench comparison (round-10 verdict directive #3).

Usage: python3 tools/bench_diff.py OLD_BENCH.json NEW_BENCH.json [--json OUT]

Input files are BENCH_LATEST-format: {"queries": {name: {"min": s,
"passes": [s, s, s]}, ...}, ...}. With 180+ entries on a shared VM the
pass-total spread runs +/-13%, so a bare min-over-min ratio at the 1.3x
band flags noise. The model here requires BOTH of:

  1. a session-drift-normalized min ratio beyond the threshold --
     drift is the median per-query min ratio across all common
     entries, which absorbs whole-session slowdowns (JVM, noisy
     neighbor, suite growth) without masking single-query moves; and
  2. non-overlapping pass ranges -- EVERY pass of the slower run
     slower than EVERY pass of the faster one. A genuinely regressed
     plan is slower on all three passes; a noisy neighbor hits one or
     two (cf. q_moving_avg's [9.6, 1.2, 1.0] r10 passes: a 9.6s
     outlier pass with an unchanged min is noise, not regression).

Queries under the absolute floor (min < 0.2 s in both runs) are never
flagged -- sub-200ms timings on a shared VM are scheduler noise.
Improvements are reported symmetrically (same criteria, inverted).

Validated on the round-9 -> round-10 data: flags corpus_bpe_merges
(1.25 -> 2.01 s, all passes elevated) and nothing else.
"""
import json
import statistics
import sys

THRESHOLD = 1.3   # normalized min-ratio band
FLOOR = 0.2       # seconds; below this in both runs -> never flagged


def load(path):
    with open(path) as f:
        d = json.load(f)
    q = d.get("queries", {})
    if not q:
        sys.exit(f"{path}: no per-query map (need BENCH_LATEST format, "
                 "not the truncated BENCH_rNN tail)")
    return q


def diff(old, new, threshold=THRESHOLD, floor=FLOOR):
    common = sorted(set(old) & set(new))
    if not common:
        sys.exit("no common queries between the two files")
    drift = statistics.median(new[k]["min"] / old[k]["min"] for k in common)
    regressions, improvements = [], []
    for k in common:
        o, n = old[k], new[k]
        if o["min"] < floor and n["min"] < floor:
            continue
        norm = (n["min"] / o["min"]) / drift
        entry = {
            "query": k,
            "old_min": o["min"], "new_min": n["min"],
            "old_passes": o["passes"], "new_passes": n["passes"],
            "ratio": round(n["min"] / o["min"], 3),
            "normalized_ratio": round(norm, 3),
        }
        if norm >= threshold and min(n["passes"]) > max(o["passes"]):
            regressions.append(entry)
        elif norm <= 1 / threshold and max(n["passes"]) < min(o["passes"]):
            improvements.append(entry)
    return {
        "n_common": len(common),
        "only_old": sorted(set(old) - set(new)),
        "only_new": sorted(set(new) - set(old)),
        "session_drift": round(drift, 4),
        "threshold": threshold,
        "regressions": sorted(regressions, key=lambda e: -e["normalized_ratio"]),
        "improvements": sorted(improvements, key=lambda e: e["normalized_ratio"]),
    }


def main(argv):
    args = [a for a in argv if not a.startswith("--")]
    if len(args) != 2:
        sys.exit(__doc__)
    out = None
    if "--json" in argv:
        out = argv[argv.index("--json") + 1]
        args = [a for a in args if a != out]
    result = diff(load(args[0]), load(args[1]))
    print(f"common queries: {result['n_common']}  "
          f"session drift: {result['session_drift']}x  "
          f"(+{len(result['only_new'])} new, -{len(result['only_old'])} removed)")
    for kind in ("regressions", "improvements"):
        rows = result[kind]
        print(f"{kind}: {len(rows)}")
        for e in rows:
            print(f"  {e['query']}: {e['old_min']} -> {e['new_min']} s "
                  f"(x{e['ratio']}, normalized x{e['normalized_ratio']}) "
                  f"passes {e['old_passes']} -> {e['new_passes']}")
    if out:
        with open(out, "w") as f:
            json.dump(result, f, indent=1)
        print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
