#!/usr/bin/env bash
# SF-1 soak: build the x10 fixtures from sf0.1 and run a wide query
# subset through the correctness gate (Verify + DuckDB oracle compare)
# and the bench, leaving CORRECTNESS_sf1* / BENCH_sf1* sidecars.
#
# Three fixtures, three regimes:
#   - PLAIN (x10 replication): deliberately clone-heavy — every doc has
#     10 exact copies. Pins the canonical dedup forms' clone-immunity
#     and everything whose cost must not depend on duplication.
#   - DECLONED (x10 with per-replica token noise): doc replicas are
#     neither exact nor near duplicates, so the all-docs near-dup
#     family PLUS the doc-plane text/overlap/packing/decon families are
#     measured in their df-cap (linear) regime — the production regime
#     on natural corpora. The legacy all-docs forms (driver keys
#     legacy_*) are the COMPARISON baseline (canonical forms are the
#     served default); they also bench ONCE on the plain fixture into
#     their own sidecar (BENCH_sf1_legacy.json) so the canonical-vs-
#     legacy clone-immunity gap stays measured while the headline plain
#     artifact carries no clone-quadratic audit entry.
#   - ANN200K (the de-cloned fixture with embeddings x100, perturbed —
#     200k distinct vectors): the ANN SERVING family alone, at a corpus
#     two orders past the doc count where partition pruning and PQ
#     memory wins register. Kept OUT of the de-cloned gate because that
#     gate carries legacy_dedup_consensus, whose embedding vote is the
#     brute-force all-pairs kernel — quadratic in vectors by documented
#     contract.
#
# Excluded by design: bpe_merges / bpe_tokenize / text_compression_profile
# (oracles fixture-pinned to the driver correctness fixture),
# emb_near_pairs (brute-force kernel, bucketed-only contract),
# multimodal_image_near_dup (binary payloads clone verbatim in BOTH
# fixtures — declone perturbs text only — so its pair output is
# clone-quadratic by construction).
#
# Query counts are DERIVED from the lists below and the gate asserts
# the exact expected PASS count — never trust grep-filtered output.
#
# Usage: tools/soak_sf1.sh [out_prefix]   (default sidecars land in CWD)
set -euo pipefail
cd "$(dirname "$0")/.."
# scale fixtures need driver heap beyond the 8g sf0.1 default: the
# legacy all-docs comparison forms at SF-1 OOM an 8g heap once ~180
# queries of session state have accumulated (observed round 10)
export SPARK_DRIVER_MEM="${SPARK_DRIVER_MEM:-24g}"
PREFIX="${1:-.}"
mkdir -p "$PREFIX"
FIX=/tmp/graft_sf1
FIXD=/tmp/graft_sf1_decloned
# _e100: the de-cloned fixture with embeddings on a x100 perturbed
# replication (200k distinct vectors) — the ANN SERVING family's scale
# point, gated separately: the de-cloned gate proper keeps x10
# embeddings because it carries `legacy_dedup_consensus`, whose
# embedding vote is the BRUTE-FORCE all-pairs kernel (quadratic in
# vectors by documented contract — x100 vectors would turn the gate
# into a multi-hour audit run; observed round 11)
FIXE=/tmp/graft_sf1_decloned_e100

TS="ts_counter_hour_fill,ts_counter_none,ts_slice_15m,ts_sql_surface,\
ts_avg_day_fill,ts_week_fill,ts_month_fill,ts_offset_day,ts_interp_fill,\
ts_moving_avg,ts_rate,ts_lenient_ingest,ts_service_end_to_end,\
ts_routing_hier,ts_grouping_paths,ts_multi_fact,ts_multi_fillers,\
ts_multi_hist,ts_multi_distinct,ts_multi_mixed,\
ts_multi_routed,ts_erasure_serve,ts_retention_serve,ts_asof_batch,\
ts_rollup_hour_fill,ts_hist,ts_hist_day,ts_hist_pct,ts_hist_cdf,\
ts_hist_merged,ts_hist_rollup,ts_routed_hist,ts_routed_hist_day,\
ts_distinct_day,ts_distinct_rollup,ts_distinct_sketch,ts_pct_sketch,\
ts_routed_avg,ts_routed_day_tier,ts_routed_distinct,\
ts_routed_distinct_day,ts_routed_unaligned,ts_routed_sql,\
ts_cusum_routed,q1_routed_mv,series_trend_routed,\
ts_fill_sql,ts_multi_sql,ts_hist_sql,ts_window_sql,ts_advised_route,\
ts_hist_window_sql,ts_route_explain,\
ts_multi_dims,ts_multi_filters,ts_multi_filters_sql,\
ts_window_day_sql,ts_workload_advice,ts_workload_persisted"
STREAM="ts_stream_maintained_fill,ts_stream_distinct_fill,\
ts_stream_distinct_sketch,ts_stream_pct_sketch,stream_anomalies,\
stream_cusum,stream_ewma,stream_holt,stream_funnel,stream_sessions,\
stream_sessions_capped,stream_user_features,stream_cdc_user_state,\
stream_scd_click_level,stream_decontaminate,stream_manifest,\
stream_quality_monitor,stream_next_examples,stream_late_profile,\
stream_scrub_profile,stream_click_attrib,stream_ann_ivf,\
stream_bm25_indexed,stream_bm25_erased,ts_multi_stream"
REL="q1_pricing_summary,q3_shipping_priority,q5_local_supplier_volume,\
q6_forecast_revenue,q2_min_cost_supplier,q9_product_profit,\
q11_important_parts,q16_supplier_counts,q20_excess_suppliers,\
topk_orders_per_customer,asof_click_purchase,\
range_click_purchase_1h,event_funnel,event_ewma,event_cusum,\
event_anomalies,event_next_examples,event_sessions,event_user_features,\
events_cube,events_pivot,basket_frequent_pairs,basket_triangles,basket_triangles_approx,\
basket_rules,events_pagerank,events_ppr_signup,rolling_wau,\
session_hourly_active,user_rfm,event_transition_matrix,\
events_kanon_release,cdc_user_state,scd_click_level,\
training_asof_features,events_date_partitioned"
ANN="ann_bruteforce_topk,ann_filtered_topk,ann_int8_topk,\
ann_ivf_kmeans_topk,ann_ivf_persisted,ann_ivf_probe3,\
ann_ivf_incremental,ann_ivf_refit,ann_ivfpq_topk,ann_pq_rerank,\
ann_pq_stamped,\
ann_recall_persisted,ann_erased_topk,ann_erase_closed,\
ann_probe_recall_curve,\
emb_lsh_near_pairs,emb_label_outliers,\
hard_negatives,hybrid_search,decontaminate_semantic"
TEXT="text_stats,text_fingerprint,text_normalize,text_repetition,\
text_lm_quality,text_line_langs,rare_token_stats,vocab_top_terms,\
text_bigram_lm,tfidf_top_terms,text_bm25_topk,text_bm25_indexed,\
text_bm25_erased,text_bm25_erase_closed,\
phrase_hits,phrase_hits_indexed,proximity_hits,boilerplate_clean,\
doc_chunks,length_percentiles,pii_stats,text_simhash,text_cooccurrence,\
tokenize_with_vocab,source_overlap_matrix,source_overlap_kmv,\
text_source_profile_cached,corpus_manifest,corpus_diff"
DEDUP_SAFE="dedup_exact,dedup_rate_by_source,dedup_clusters_canonical,\
dedup_canonical_incremental,dedup_span_removal,dedup_consensus_lsh"
PIPE="pack_sequences,pack_by_split,pack_profile,sample_stratified,\
sample_topk_per_source,sample_weighted_topk,sample_shuffle_positions,\
curriculum_positions,fim_examples,span_corruption_examples,\
mix_sources_profile,budget_by_lang,budget_selection,quality_report,\
decontaminate_overlap,decontaminate_bloom,multimodal_image_features,\
multimodal_scene_cuts,multimodal_audio_features,\
multimodal_video_features,multimodal_frame_sample,modal_integrity,\
er_part_entities,er_part_canonical,er_part_matches,\
er_part_matches_multi,er_incremental,er_block_profile,\
series_similarity,index_batches,pipeline_scrub_profile"
QUERIES="$TS,$STREAM,$REL,$ANN,$TEXT,$DEDUP_SAFE,$PIPE"

# the all-docs near-dup family (driver keys legacy_*): df-cap linear
# regime on the DECLONED fixture — its production regime; the
# canonical twins run there too (same labels either way). The exact
# ensemble legacy_dedup_consensus gates here (its clone-fixture slot
# moved to dedup_consensus_lsh, the served ensemble, above).
NEARDUP="legacy_dedup_ngram_jaccard,dedup_minhash_lsh,dedup_simhash_pairs,\
legacy_dedup_containment,legacy_dedup_clusters,legacy_dedup_clusters_star,\
legacy_dedup_clusters_incremental,dedup_keep_best,dedup_cluster_cohesion,\
dedup_cluster_sizes,dedup_incremental,split_leakage_profile,\
dedup_clusters_canonical,dedup_canonical_incremental,\
dedup_consensus_lsh,legacy_dedup_consensus"
# legacy comparison forms benched ONCE (not gated) on the PLAIN
# fixture in their own sidecar (BENCH_sf1_legacy.json) so the
# canonical-vs-legacy clone-immunity gap stays measured without the
# clone-quadratic audit forms sitting in the headline artifact
LEGACY="legacy_dedup_ngram_jaccard,legacy_dedup_clusters,\
legacy_dedup_clusters_incremental,legacy_dedup_consensus"
# the 200k-vector ANN point (FIXE): the partition-pruned / PQ serving
# paths measured against the brute-force TOP-K baseline (k-bounded,
# linear — NOT the all-pairs kernel) at a corpus size where pruning
# registers
ANND="ann_bruteforce_topk,ann_ivf_persisted,ann_ivfpq_topk,ann_pq_stamped,\
ann_recall_persisted,hybrid_search"
# the doc-plane families whose shape changes without clones
# (containment/co-occurrence/repetition/overlap/packing/decon);
# ER stays main-gate-only — er_* reads the PART table, which the
# declone (a documents-text perturbation) leaves byte-identical
DOCSD="text_cooccurrence,text_repetition,text_simhash,\
source_overlap_matrix,source_overlap_kmv,tfidf_top_terms,\
vocab_top_terms,rare_token_stats,text_bm25_topk,quality_report,\
decontaminate_overlap,decontaminate_bloom,corpus_manifest,\
corpus_diff,dedup_rate_by_source,pack_sequences,sample_stratified,\
boilerplate_clean,text_lm_quality"
DECLONED="$NEARDUP,$DOCSD"

# the docs must carry the shipped query surface before any soak lands
python3 tools/check_inventory.py

[ -d "$FIX" ] || python3 tools/make_scaled_fixture.py \
  /root/testdata/sf0.1 "$FIX" 10
[ -d "$FIXD" ] || python3 tools/make_scaled_fixture.py \
  /root/testdata/sf0.1 "$FIXD" 10 --declone
[ -d "$FIXE" ] || python3 tools/make_scaled_fixture.py \
  /root/testdata/sf0.1 "$FIXE" 10 --declone --embed-factor 100

count() { awk -F, '{print NF}' <<<"$1"; }

run_gate() { # fixture query-list tag
  local fixture="$1" qlist="$2" tag="$3"
  local out="/tmp/graft_soak_verify_$tag"
  local n; n=$(count "$qlist")
  echo "== gate $tag: $n queries =="
  SPARK_GRAFT_ONLY="$qlist" sbt -batch \
    "runMain graft.Verify $fixture $out" 2>&1 | tail -2
  python3 tools/check_oracle.py "$out" "$fixture" \
    | tee "$PREFIX/CORRECTNESS_sf1_$tag.txt"
  grep -q "== $n pass, 0 fail ==" "$PREFIX/CORRECTNESS_sf1_$tag.txt" || {
    echo "soak $tag: expected exactly $n passes"; exit 1; }
}

run_gate "$FIX" "$QUERIES" main
run_gate "$FIXD" "$DECLONED" decloned
run_gate "$FIXE" "$ANND" ann200k

# SPARK_GRAFT_BENCH_OUT lands each artifact as CLEAN json (no sbt
# [info] prefix to strip — round-11 verdict item 8)
SPARK_GRAFT_SF_DIR="$FIX" SPARK_GRAFT_BENCH_ONLY="$QUERIES" \
  SPARK_GRAFT_BENCH_PASSES=2 \
  SPARK_GRAFT_BENCH_OUT="$PREFIX/BENCH_sf1.json" \
  sbt -batch "runMain graft.Bench" 2>&1 | tail -1 >/dev/null
SPARK_GRAFT_SF_DIR="$FIXD" SPARK_GRAFT_BENCH_ONLY="$DECLONED" \
  SPARK_GRAFT_BENCH_PASSES=2 \
  SPARK_GRAFT_BENCH_OUT="$PREFIX/BENCH_sf1_decloned.json" \
  sbt -batch "runMain graft.Bench" 2>&1 | tail -1 >/dev/null
SPARK_GRAFT_SF_DIR="$FIXE" SPARK_GRAFT_BENCH_ONLY="$ANND" \
  SPARK_GRAFT_BENCH_PASSES=2 \
  SPARK_GRAFT_BENCH_OUT="$PREFIX/BENCH_sf1_ann200k.json" \
  sbt -batch "runMain graft.Bench" 2>&1 | tail -1 >/dev/null
# the clone-quadratic audit baselines, measured once each
SPARK_GRAFT_SF_DIR="$FIX" SPARK_GRAFT_BENCH_ONLY="$LEGACY" \
  SPARK_GRAFT_BENCH_PASSES=1 \
  SPARK_GRAFT_BENCH_OUT="$PREFIX/BENCH_sf1_legacy.json" \
  sbt -batch "runMain graft.Bench" 2>&1 | tail -1 >/dev/null
for f in BENCH_sf1 BENCH_sf1_decloned BENCH_sf1_ann200k BENCH_sf1_legacy; do
  python3 -c "import json; json.load(open('$PREFIX/$f.json'))"
done
echo "soak done: $(count "$QUERIES")+$(count "$DECLONED")+$(count "$ANND") gated;" \
  "$PREFIX/CORRECTNESS_sf1_{main,decloned,ann200k}.txt" \
  "$PREFIX/BENCH_sf1{,_decloned,_ann200k,_legacy}.json"
