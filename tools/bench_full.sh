#!/usr/bin/env bash
# Full-suite bench with STRUCTURAL coverage gating — the committed
# full bench artifact has twice silently lacked a round's last-landed
# query (round-10: two keys; round-12: ts_hist_window_sql), because
# nothing asserted bench-keys ⊇ correctness-keys on the artifact that
# actually lands in the repo. This script is now the ONLY sanctioned
# way to produce BENCH_local_r*.json: it runs graft.Bench over the
# ENTIRE SparkEntry surface and then bench_coverage.py asserts the
# artifact covers the gated query set (every correctness key present
# and non-negative, plus BOTH halves of every lifecycle split) before
# the artifact is considered landed — the exact docs↔code discipline
# check_inventory.py applies, applied to bench↔correctness.
#
# Usage:
#   tools/bench_full.sh BENCH_local_r13.json [queries-source]
#
# queries-source: a graft.Verify output dir (one subdir per query) or
# a driver CORRECTNESS_r*.json; defaults to the round's sf0.01 verify
# output at /tmp/graft_verify_sf001.
set -euo pipefail
cd "$(dirname "$0")/.."
OUT="${1:?usage: bench_full.sh <out.json> [queries-source]}"
SRC="${2:-/tmp/graft_verify_sf001}"
[ -e "$SRC" ] || { echo "bench_full: queries-source $SRC missing —" \
  "run graft.Verify first (the artifact must be gated against the" \
  "round's own query set, not an older round's)"; exit 1; }
SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}" \
  SPARK_GRAFT_BENCH_OUT="$OUT" \
  sbt -batch "runMain graft.Bench" 2>&1 | tail -1 >/dev/null
python3 -c "import json; json.load(open('$OUT'))"
python3 tools/bench_coverage.py "$OUT" "$SRC"
echo "bench_full: $OUT landed with" \
  "$(python3 -c "import json;print(len(json.load(open('$OUT'))['queries']))")" \
  "keys, coverage-gated against $SRC"
