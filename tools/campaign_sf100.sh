#!/bin/bash
# Round-17 at-scale hash-check campaign (r16 verdict item 1): widen the
# sf100 oracle record from the 15-key priority subset to the full
# comparable surface, in feasibility order — the 100 TB-critical
# text/dedup/curation families first — with per-batch dump cleanup so the
# campaign fits the container's free disk.
#
# Phase 0 re-proves the embeddings families at sf30 on the NEW perturbed
# fixture (ScaleFixtures r17: replicated copies carry seeded noise), which
# also produces the q_sim_recall dump the recall-at-scale re-measure reads,
# and closes the q_dedup_semantic gap with the phased oracle.
#
# Usage: campaign_sf100.sh <sf30Dir> <sf100Dir> <logFile>
set -uo pipefail
cd "$(dirname "$0")/.."
SF30="$1"; SF100="$2"; LOG="$3"
V30=/tmp/vout30_r17
V100=/tmp/vout100_r17
mkdir -p "$V30" "$V100"

run() { # run <sfDir> <vout> <cap> <keys>
  df -h / | tail -1 | tee -a "$LOG"
  tools/hashcheck_batch.sh "$1" "$2" "$3" "$4" "$LOG"
}

SIM=q_sim_topk,q_sim_topk_batch,q_sim_topk_lsh,q_sim_topk_ivf,q_sim_topk_ivf_trained,q_sim_topk_ivfpq,q_sim_topk_ivfpq_rr,q_sim_topk_pq,q_sim_topk_pq_rr,q_kmeans,q_cluster_stats,q_pq_train,q_pq_stats,q_embed_quantize,q_sim_recall
SERVE=q_sim_serve_ivf_trained,q_sim_serve_pq,q_sim_serve_ivfpq,q_sim_serve_pq_rr,q_sim_serve_ivfpq_rr

echo "### PHASE 0: sf30 embeddings families on the perturbed fixture" | tee -a "$LOG"
run "$SF30" "$V30" 1800 "$SIM,$SERVE,q_dedup_embed,q_dedup_semantic,q_multimodal_dedup"
# keep the q_sim_recall dump for the recall re-measure: re-dump it alone
SPARK_GRAFT_ONLY=q_sim_recall SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=16g \
  tools/run_main.sh graft.Verify "$SF30" /tmp/recall_sf30_r17 >> "$LOG" 2>&1

echo "### PHASE 1: sf100 text/curation" | tee -a "$LOG"
run "$SF100" "$V100" 1800 q_text_stats,q_lang_id,q_token_count,q_fingerprint,q_quality_score,q_quality_filter,q_lm_score,q_repetition,q_tfidf,q_top_terms,q_top_bigrams,q_bpe_train,q_bpe_apply,q_pack_sequences,q_token_budget,q_sample_stratified,q_source_mix,q_decontaminate,q_contam_coverage,q_chunk_docs,q_pii_redact,q_dedup_rate_by_source,q_url_dedup,q_domain_mix

echo "### PHASE 2: sf100 dedup (banded families + phased semantic)" | tee -a "$LOG"
run "$SF100" "$V100" 1800 q_dedup_exact,q_dedup_minhash,q_dedup_ngram,q_dedup_substring,q_dedup_embed,q_source_overlap
run "$SF100" "$V100" 2700 q_dedup_semantic

echo "### PHASE 3: sf100 similarity/cluster/pq" | tee -a "$LOG"
run "$SF100" "$V100" 1800 "$SIM"

echo "### PHASE 4: sf100 relational/alarm/session (small outputs)" | tee -a "$LOG"
run "$SF100" "$V100" 1800 q_scan_filter,q_last_value,q_latest_per_group,q_in_list,q_coalesce_cast,q_time_range,q_notnull_filter,q_mv_minute,q_mv_hourly,q_percentiles,q_counter_rate,q_time_weight,q_spc_rules,q_downsample_ohlc,q_downsample_lttb,q_alarm_feed,q_alarm_retention,q_approx_distinct,q_funnel,q_uptime,q_state_agg,q_threshold_alarms,q_auto_recovery,q_order_progress,q_feeder_low_edge,q_feeder_empty_edge

echo "### PHASE 5: sf100 simhash (the 340M-pair frame)" | tee -a "$LOG"
run "$SF100" "$V100" 3600 q_dedup_simhash

echo "### PHASE 6: sf100 big relational frames" | tee -a "$LOG"
run "$SF100" "$V100" 3600 q_gapfill_locf
run "$SF100" "$V100" 3600 q_gapfill_interp
run "$SF100" "$V100" 3600 q_union_types,q_asof_join
run "$SF100" "$V100" 3600 q_raw_timeseries,q_deviation_immediate,q_deviation_trend

echo "### PHASE 7: sf100 dataflow full-corpus frames" | tee -a "$LOG"
run "$SF100" "$V100" 2700 q_enrich_join,q_type_dispatch,xform_envelope,src_schema_discovery
run "$SF100" "$V100" 2700 src_opcua,src_mqtt,src_kafka
run "$SF100" "$V100" 2700 snk_mqtt,snk_kafka,snk_jdbc

echo "### CAMPAIGN COMPLETE" | tee -a "$LOG"
