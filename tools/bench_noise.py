#!/usr/bin/env python3
"""Merge N back-to-back Bench runs into BENCH_NOISE_r{N}.json.

Purpose (round-8 verdict task 1): the r6->r7 driver bench drifted +8.4%
on pre-existing queries whose code did not change. This artifact
measures the run-to-run noise band of the SAME build on ONE machine so
"drift" has a yardstick: a per-query delta inside the measured band is
ambient (JVM/codegen cache, page cache, scheduler), outside it is a
regression to bisect.

Usage: python3 tools/bench_noise.py OUT run1.json run2.json [run3.json ...]
       [--ref BENCH_FULL.json]   # optional cross-machine reference
"""
import json
import statistics
import sys

argv = sys.argv[1:]
ref_path = None
if "--ref" in argv:
    i = argv.index("--ref")
    ref_path = argv[i + 1]
    argv = argv[:i] + argv[i + 2:]
out, runs = argv[0], argv[1:]

data = [json.load(open(p)) for p in runs]
names = sorted(set().union(*[d["queries"].keys() for d in data]))
queries = {}
spreads = []
for n in names:
    ts = [d["queries"].get(n, -1.0) for d in data]
    if any(t < 0 for t in ts):
        queries[n] = {"runs": ts, "err": True}
        continue
    lo, hi = min(ts), max(ts)
    med = statistics.median(ts)
    rel = (hi - lo) / lo if lo > 0 else 0.0
    queries[n] = {"runs": [round(t, 3) for t in ts], "min": round(lo, 3),
                  "max": round(hi, 3), "median": round(med, 3),
                  "rel_spread": round(rel, 3)}
    spreads.append(rel)

totals = [sum(t for t in d["queries"].values() if t >= 0) for d in data]
summary = {
    "machine": data[0].get("machine", "builder"),
    "methodology": data[0].get("methodology"),
    "n_runs": len(runs),
    "n_queries": len(names),
    "totals": [round(t, 3) for t in totals],
    "total_rel_spread": round((max(totals) - min(totals)) / min(totals), 4),
    "per_query_rel_spread_median": round(statistics.median(spreads), 4),
    "per_query_rel_spread_p90": round(sorted(spreads)[int(0.9 * len(spreads))], 4),
    "per_query_rel_spread_max": round(max(spreads), 4),
}
summary["conclusion"] = (
    "same-build back-to-back totals spread {:.1%} run-to-run (min-of-2 "
    "protocol notwithstanding); any cross-round total drift inside this "
    "band is ambient (page cache, JIT/codegen state, scheduler), not a "
    "code regression".format(summary["total_rel_spread"]))
if ref_path:
    ref = json.load(open(ref_path))
    common = [n for n in names if ref["queries"].get(n, -1) > 0
              and "min" in queries[n]]
    ref_total = sum(ref["queries"][n] for n in common)
    here_total = sum(queries[n]["min"] for n in common)
    summary["ref"] = {
        "file": ref_path, "machine": ref.get("machine", "driver"),
        "n_common": len(common),
        "ref_total_common": round(ref_total, 3),
        "this_min_total_common": round(here_total, 3),
        "note": "cross-machine comparison: protocol identical, hardware not",
    }
json.dump({"summary": summary, "queries": queries}, open(out, "w"), indent=1)
print(json.dumps(summary, indent=1))
