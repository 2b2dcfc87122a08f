#!/usr/bin/env bash
# SF-10 soak (the x100 scale point, round-11 verdict item 5): scale
# sf0.1 by x100 — events 10M rows, documents 500k (clone-heavy, the
# canonical-dedup regime), embeddings 200k distinct perturbed vectors,
# lineitem 60M rows — and gate the families whose 100 TB story IS the
# product: the routed/advised/windowed ts serving reads, the canonical
# dedup close, the IVF/IVF-PQ store, and the BM25 index.
#
# basket_triangles is BENCH-only at this scale (verdict item 10: watch
# the curve over the x100 co-purchase graph): its DuckDB oracle is a
# 3-way self-join that does not bound like the engine's
# degree-oriented kernel.
#
# Query counts are DERIVED from the lists and the gate asserts the
# exact expected PASS count — never trust grep-filtered output.
#
# Usage: tools/soak_sf10.sh [out_prefix]
set -euo pipefail
cd "$(dirname "$0")/.."
export SPARK_DRIVER_MEM="${SPARK_DRIVER_MEM:-48g}"
PREFIX="${1:-.}"
mkdir -p "$PREFIX"
FIX=/tmp/graft_sf10

TS10="ts_counter_hour_fill,ts_service_end_to_end,ts_multi_fact,\
ts_multi_mixed,ts_multi_routed,ts_multi_dims,ts_advised_route,\
ts_fill_sql,ts_window_sql,ts_window_day_sql,ts_route_explain,\
ts_routed_day_tier,ts_rollup_hour_fill,ts_hist,ts_distinct_day,\
ts_multi_filters"
DEDUP10="dedup_exact,dedup_rate_by_source,dedup_clusters_canonical,\
dedup_canonical_incremental"
ANN10="ann_bruteforce_topk,ann_ivf_persisted,ann_ivfpq_topk,\
ann_recall_persisted,hybrid_search"
TEXT10="text_bm25_indexed,text_bm25_topk"
QUERIES="$TS10,$DEDUP10,$ANN10,$TEXT10"
BENCHQ="$QUERIES,basket_triangles,basket_triangles_approx"

python3 tools/check_inventory.py

[ -d "$FIX" ] || python3 tools/make_scaled_fixture.py \
  /root/testdata/sf0.1 "$FIX" 100 --embed-factor 100

count() { awk -F, '{print NF}' <<<"$1"; }

N=$(count "$QUERIES")
echo "== sf10 gate: $N queries =="
OUT=/tmp/graft_soak_verify_sf10
SPARK_GRAFT_ONLY="$QUERIES" sbt -batch \
  "runMain graft.Verify $FIX $OUT" 2>&1 | tail -2
python3 tools/check_oracle.py "$OUT" "$FIX" \
  | tee "$PREFIX/CORRECTNESS_sf10_main.txt"
grep -q "== $N pass, 0 fail ==" "$PREFIX/CORRECTNESS_sf10_main.txt" || {
  echo "sf10 soak: expected exactly $N passes"; exit 1; }

SPARK_GRAFT_SF_DIR="$FIX" SPARK_GRAFT_BENCH_ONLY="$BENCHQ" \
  SPARK_GRAFT_BENCH_PASSES=2 \
  SPARK_GRAFT_BENCH_OUT="$PREFIX/BENCH_sf10.json" \
  sbt -batch "runMain graft.Bench" 2>&1 | tail -1 >/dev/null
python3 -c "import json; json.load(open('$PREFIX/BENCH_sf10.json'))"
echo "sf10 soak done: $N gated; $PREFIX/CORRECTNESS_sf10_main.txt" \
  "$PREFIX/BENCH_sf10.json"
