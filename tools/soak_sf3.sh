#!/usr/bin/env bash
# Second scale point (verdict r9 #10): a x30 fixture from sf0.1
# (~18 M lineitem / 3 M events / 150 k docs — "SF-3") running the
# ts + routed + canonical-dedup subset through the same oracle gate,
# to confirm the SF-1 curves extrapolate (the FLAT ts-read claim is
# the one most worth a second data point). Counts derived, PASS count
# asserted exactly — same discipline as tools/soak_sf1.sh.
#
# Usage: tools/soak_sf3.sh [out_prefix]
set -euo pipefail
cd "$(dirname "$0")/.."
# x30 needs driver heap beyond the 8g sf0.1 default (see soak_sf1.sh)
export SPARK_DRIVER_MEM="${SPARK_DRIVER_MEM:-24g}"
PREFIX="${1:-.}"
mkdir -p "$PREFIX"
FIX=/tmp/graft_sf3

QUERIES="ts_counter_hour_fill,ts_sql_surface,ts_avg_day_fill,\
ts_interp_fill,ts_service_end_to_end,ts_grouping_paths,ts_multi_mixed,\
ts_multi_hist,ts_multi_distinct,ts_multi_fillers,\
ts_multi_routed,ts_rollup_hour_fill,ts_asof_batch,ts_retention_serve,\
ts_hist,ts_hist_day,ts_distinct_sketch,ts_routed_avg,\
ts_routed_day_tier,ts_routed_distinct,ts_routed_sql,\
ts_routed_unaligned,ts_routed_hist,q1_routed_mv,series_trend_routed,\
ts_fill_sql,ts_multi_sql,ts_hist_sql,ts_window_sql,\
ts_advised_route,ts_multi_dims,dedup_consensus_lsh,\
dedup_exact,dedup_rate_by_source,dedup_clusters_canonical,\
dedup_canonical_incremental,q1_pricing_summary,event_sessions,\
decontaminate_bloom,stream_sessions"

[ -d "$FIX" ] || python3 tools/make_scaled_fixture.py \
  /root/testdata/sf0.1 "$FIX" 30

N=$(awk -F, '{print NF}' <<<"$QUERIES")
OUT=/tmp/graft_sf3_verify
echo "== sf3 gate: $N queries =="
SPARK_GRAFT_ONLY="$QUERIES" sbt -batch \
  "runMain graft.Verify $FIX $OUT" 2>&1 | tail -2
python3 tools/check_oracle.py "$OUT" "$FIX" \
  | tee "$PREFIX/CORRECTNESS_sf3.txt"
grep -q "== $N pass, 0 fail ==" "$PREFIX/CORRECTNESS_sf3.txt" || {
  echo "sf3 soak: expected exactly $N passes"; exit 1; }

SPARK_GRAFT_SF_DIR="$FIX" SPARK_GRAFT_BENCH_ONLY="$QUERIES" \
  SPARK_GRAFT_BENCH_PASSES=2 \
  SPARK_GRAFT_BENCH_OUT="$PREFIX/BENCH_sf3.json" \
  sbt -batch "runMain graft.Bench" 2>&1 | tail -1 >/dev/null
python3 -c "import json; json.load(open('$PREFIX/BENCH_sf3.json'))"
echo "sf3 soak done: $PREFIX/CORRECTNESS_sf3.txt $PREFIX/BENCH_sf3.json"
