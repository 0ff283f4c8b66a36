#!/usr/bin/env bash
# Round-end bench regression GATE (round-9 verdict task 8): run the full
# bench, diff it per-query against the committed previous-round anchor
# inside the measured noise band, and FAIL (exit nonzero) on any
# unexplained out-of-band regression — the explain-or-fix discipline as a
# command instead of a convention.
#
# Usage: tools/round_gate.sh <round> [--explain name=reason ...]
#   - runs graft.Bench at sf0.1 (driver protocol); stdout line saved as BENCH_LOCAL_r<round>.json (BENCH_r<round>.json is the DRIVER's name of record)
#   - diffs against BENCH_FULL.json (the committed previous full registry)
#     using BENCH_NOISE_r8.json's band
#   - writes BENCH_DIFF_r<round>.json; exit 1 if bench_diff flags anything
#
# Expect same-build noise of ±18% on totals (BENCH_NOISE_r8): one run is a
# gate for OUTLIERS, never a verdict on a few-percent total drift.
set -euo pipefail
cd "$(dirname "$0")/.."
ROUND="${1:?usage: tools/round_gate.sh <round> [--explain name=reason ...]}"
shift

# graft.Bench OVERWRITES BENCH_FULL.json with the new run's complete map
# (its stdout line carries only the slowest subset) — so the previous
# round's anchor must be pulled from git BEFORE the run, and the diff
# compares full map vs full map.
ANCHOR="$(mktemp /tmp/bench_anchor.XXXX.json)"
git show HEAD:BENCH_FULL.json > "$ANCHOR"

# (grep || true): with pipefail, a no-match grep would kill the script
# before the [ -s ] diagnostic below ever runs
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
  sbt -batch "runMain graft.Bench" 2>/dev/null \
  | { grep -oE '\{"metric".*' || true; } | tail -1 > "BENCH_LOCAL_r${ROUND}.json"
[ -s "BENCH_LOCAL_r${ROUND}.json" ] || { echo "bench produced no JSON line" >&2; exit 2; }

python3 tools/bench_diff.py "BENCH_DIFF_r${ROUND}.json" \
  BENCH_FULL.json "$ANCHOR" --noise BENCH_NOISE_r8.json "$@"
