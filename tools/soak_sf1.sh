#!/usr/bin/env bash
# SF-1 soak: build the x10 fixture from sf0.1, run a 22-query subset
# through the correctness gate (Verify + DuckDB oracle compare) and the
# bench (2 passes), leaving CORRECTNESS_sf1 / BENCH_sf1 sidecars.
#
# Usage: tools/soak_sf1.sh [out_prefix]   (default sidecars land in CWD)
set -euo pipefail
cd "$(dirname "$0")/.."
PREFIX="${1:-.}"
mkdir -p "$PREFIX"
FIX=/tmp/graft_sf1
# 44 queries spanning every family (bpe_* excluded: their oracles are
# deliberately fixture-pinned to the driver correctness fixture)
QUERIES="ts_counter_hour_fill,ts_routed_sql,ts_rollup_hour_fill,ts_asof_batch,ts_retention_serve,ts_grouping_paths,ts_multi_mixed,dedup_exact,dedup_ngram_jaccard,dedup_minhash_lsh,dedup_clusters,dedup_clusters_incremental,dedup_keep_best,dedup_rate_by_source,ann_bruteforce_topk,ann_ivf_kmeans_topk,ann_ivf_persisted,ann_ivf_refit,ann_pq_rerank,text_stats,tfidf_top_terms,text_bm25_topk,tokenize_with_vocab,text_cooccurrence,dedup_clusters_canonical,dedup_canonical_incremental,q1_pricing_summary,q3_shipping_priority,er_part_entities,er_incremental,pack_sequences,span_corruption_examples,multimodal_image_features,multimodal_scene_cuts,event_sessions,event_user_features,decontaminate_overlap,decontaminate_bloom,sample_stratified,budget_selection,stream_sessions,stream_bm25_indexed,events_date_partitioned,basket_frequent_pairs,events_pagerank,series_similarity"

[ -d "$FIX" ] || python3 tools/make_scaled_fixture.py /root/testdata/sf0.1 "$FIX" 10

OUT=/tmp/graft_sf1_verify
SPARK_GRAFT_ONLY="$QUERIES" sbt -batch "runMain graft.Verify $FIX $OUT" \
  2>&1 | tail -2
python3 tools/check_oracle.py "$OUT" "$FIX" \
  | grep -v "spark result missing" | tee "$PREFIX/CORRECTNESS_sf1.txt"

SPARK_GRAFT_SF_DIR="$FIX" SPARK_GRAFT_BENCH_ONLY="$QUERIES" \
  SPARK_GRAFT_BENCH_PASSES=2 sbt -batch "runMain graft.Bench" 2>&1 \
  | grep '"metric"' | tail -1 > "$PREFIX/BENCH_sf1.json"
echo "soak done: $PREFIX/CORRECTNESS_sf1.txt $PREFIX/BENCH_sf1.json"
