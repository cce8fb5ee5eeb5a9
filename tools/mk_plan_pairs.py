#!/usr/bin/env python3
"""Emit plans/r15/<q>_before.txt / _after.txt pairs for the queries
touched this optimization round, from the full before/after snapshot
dirs (dev tool for the r15 deliverable)."""
import shutil, sys, os

TOUCHED = """
a2_dim_user a3_dim_event_type a4_fct_events a5_rpt_user_counts
a6_rpt_type_counts a7_rpt_discovery a9_dq_checks
c3_dedup_minhash c12_dup_clusters c36_cluster_split c95_quality_keeper
c6_ann_topk c109_rrf_fusion c125_fusion_recall
c50_curation_funnel c90_student_funnel c98_export_manifest
c101_manifest_diff c105_keeps_schedule c111_keeps_pack c117_epoch_plan
c120_keeps_manifest c124_source_yield c127_seq_vintage_diff
c129_pinned_schedule c130_seq_contam c139_decontam_pack c146_loss_mask
c152_mask_budget c86_pack_tokenized c94_pack_boundaries c132_fertility
c83_stored_tokenizer c100_multibench_contam c150_hist_drift
c154_hll_distinct c155_hll_merge c156_hll_vintage c166_register_drift
c114_lsh_geometry c118_rrf_stored c136_nprobe_sweep c138_routed_serve
c158_sketch_route c162_sketch_adc c79_stored_serving c81_index_append
c113_pq_rerank c123_repaired_serve c131_filtered_ann c133_query_ood
c172_bpe_batch_audit c179_bpe_batch_sweep
""".split()

root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
before, after = f"{root}/plans/r15/before", f"{root}/plans/r15/after"
out = f"{root}/plans/r15"
missing = []
for q in TOUCHED:
    for src, sfx in [(before, "_before"), (after, "_after")]:
        p = f"{src}/{q}.txt"
        if os.path.exists(p):
            shutil.copyfile(p, f"{out}/{q}{sfx}.txt")
        else:
            missing.append(p)
print(f"pairs for {len(TOUCHED)} queries; missing: {missing or 'none'}")
