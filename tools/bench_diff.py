#!/usr/bin/env python3
"""Per-query bench regression gate (round-8 verdict task 7).

Diffs a new full-registry bench run against the previous round's, using
the measured same-build noise band (tools/bench_noise.py artifact) as
the yardstick: a per-query slowdown INSIDE the band is ambient; outside
it is flagged for explanation or bisection. Emits BENCH_DIFF_r{N}.json.

Band per query = max(per-query rel_spread from the noise artifact,
fleet p90 rel_spread, 25%) — the 25% floor covers queries whose noise
row is missing or implausibly tight. An absolute floor of 0.25 s
ignores sub-noise jitter on fast queries.

Usage: bench_diff.py OUT new.json old.json --noise BENCH_NOISE.json
       [--explain name=reason ...]
Exit code 1 if any unexplained out-of-band regression remains.
"""
import json
import sys

argv = sys.argv[1:]
explains = {}
while "--explain" in argv:
    i = argv.index("--explain")
    k, _, v = argv[i + 1].partition("=")
    explains[k] = v
    argv = argv[:i] + argv[i + 2:]
noise_path = None
if "--noise" in argv:
    i = argv.index("--noise")
    noise_path = argv[i + 1]
    argv = argv[:i] + argv[i + 2:]
out, new_path, old_path = argv

new = json.load(open(new_path))
old = json.load(open(old_path))
noise = json.load(open(noise_path)) if noise_path else {"summary": {}, "queries": {}}
p90 = noise.get("summary", {}).get("per_query_rel_spread_p90", 0.25)

REL_FLOOR = 0.25
ABS_FLOOR = 0.25

rows = {}
flagged = []
common = sorted(set(new["queries"]) & set(old["queries"]))
for n in common:
    a, b = old["queries"][n], new["queries"][n]
    if a < 0 or b < 0:
        rows[n] = {"old": a, "new": b, "err": True}
        if b < 0:
            flagged.append(n)
        continue
    band = max(noise["queries"].get(n, {}).get("rel_spread", 0.0), p90, REL_FLOOR)
    delta = b - a
    rel = delta / a if a > 0 else 0.0
    row = {"old": round(a, 3), "new": round(b, 3), "delta": round(delta, 3),
           "rel": round(rel, 3), "band": round(band, 3)}
    # EVERY lane whose slowdown exceeds the relative band carries an
    # `explained` stamp — including the sub-absolute-floor ones, which
    # the harness explains itself (a <0.25s delta on a fast lane is
    # sub-noise jitter by the gate's own definition). No out-of-band
    # row ships explanation-less, so "unexplained: none" in the summary
    # is checkable against the rows.
    if rel > band:
        row["out_of_band"] = True
        if delta > ABS_FLOOR:
            row["regression"] = True
            if n in explains:
                row["explained"] = explains[n]
            else:
                flagged.append(n)
        else:
            row["explained"] = explains.get(
                n, f"delta {delta:+.3f}s is below the {ABS_FLOOR}s absolute "
                   "floor — sub-noise jitter on a fast lane, not a gated "
                   "regression")
    rows[n] = row

tot_old = sum(v for k, v in old["queries"].items() if k in common and v >= 0)
tot_new = sum(v for k, v in new["queries"].items() if k in common and v >= 0)
result = {
    "summary": {
        "n_common": len(common),
        "n_new_only": len(set(new["queries"]) - set(old["queries"])),
        "n_old_only": len(set(old["queries"]) - set(new["queries"])),
        "total_old_common": round(tot_old, 2),
        "total_new_common": round(tot_new, 2),
        "total_rel": round((tot_new - tot_old) / tot_old, 4) if tot_old else 0.0,
        "band_source": noise_path,
        "p90_band": p90,
        "out_of_band_unexplained": flagged,
    },
    "queries": rows,
}
json.dump(result, open(out, "w"), indent=1, sort_keys=True)
s = result["summary"]
print(f"common={s['n_common']} total {tot_old:.1f}s -> {tot_new:.1f}s "
      f"({s['total_rel']:+.1%}); unexplained out-of-band: {flagged or 'none'}")
sys.exit(1 if flagged else 0)
