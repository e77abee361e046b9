#!/bin/bash
# Round-9 probes, QUIET-WINDOW rerun (the first attempt ran under load
# ~11 and was cut off mid-batch-1; this file supersedes it):
#   batch 1-3: sf30 fourth decade for q102-q112 incl. streaming faces
#   batch 4:   first decades for round-9-new q113/q114/q116
#   batch 5:   q115 production-k probes (occupancy-constant SemDeDup)
#   batch 6:   q115 gate-face decades (the fixed-k=8 regime the bench runs)
#   batch 7:   decades for round-9-new q117-q121
cd /root/repo
P=probe_sf30_r9.txt
{
echo "== Round-9 probes (quiet rerun): sf30 fourth decade + new-op decades =="
echo "-- batch 1: sf30 batch faces --"; uptime
scripts/run-tool.sh graft.tools.Profile target/sf30 3 \
  q104_heavy_hitters q110_ams_join_size q109_bpe_train q102_merge_upsert \
  q105_dup_spans q106_pq_topk q107_cluster_split 2>/dev/null
uptime
echo "-- batch 2: sf30 q112 --"
scripts/run-tool.sh graft.tools.Profile target/sf30 3 q112_prefix_jaccard 2>/dev/null
uptime
echo "-- batch 3: sf30 streaming faces (RocksDB provider, 2 runs) --"
scripts/run-tool.sh graft.tools.Profile target/sf30 2 \
  q103_cdc_apply_stream q108_stream_outer_join q111_stream_heavy_hitters 2>/dev/null
uptime
echo "-- batch 4: q113/q114/q116 at sf1 / sf10 / sf30 --"
scripts/run-tool.sh graft.tools.Profile target/sf1 3 q113_lm_quality q114_bpe_encode q116_lsh_decontaminate 2>/dev/null
uptime
scripts/run-tool.sh graft.tools.Profile target/sf10 3 q113_lm_quality q114_bpe_encode q116_lsh_decontaminate 2>/dev/null
uptime
scripts/run-tool.sh graft.tools.Profile target/sf30 2 q113_lm_quality q114_bpe_encode q116_lsh_decontaminate 2>/dev/null
uptime
echo "-- batch 5: q115 production-k probes (occupancy-constant recipe) --"
scripts/run-tool.sh graft.tools.SemDedupProbe target/sf1 256 3 2>/dev/null
scripts/run-tool.sh graft.tools.SemDedupProbe target/sf10 512 3 2>/dev/null
scripts/run-tool.sh graft.tools.SemDedupProbe target/sf30 1024 2 2>/dev/null
uptime
echo "-- batch 6: q115 gate-face decades (fixed k=8, the bench regime) --"
scripts/run-tool.sh graft.tools.Profile /root/testdata/sf0.1 3 q115_semdedup 2>/dev/null
scripts/run-tool.sh graft.tools.Profile target/sf1 2 q115_semdedup 2>/dev/null
uptime
echo "-- batch 7: round-9-new q117-q121 at sf1 / sf10 / sf30 --"
scripts/run-tool.sh graft.tools.Profile target/sf1 3 q117_group_quantile_filter q118_dsir_resample q119_scd2_history q120_gram_matrix 2>/dev/null
uptime
scripts/run-tool.sh graft.tools.Profile target/sf10 3 q117_group_quantile_filter q118_dsir_resample q119_scd2_history q120_gram_matrix 2>/dev/null
uptime
scripts/run-tool.sh graft.tools.Profile target/sf30 2 q117_group_quantile_filter q118_dsir_resample q119_scd2_history q120_gram_matrix 2>/dev/null
uptime
echo "-- batch 7b: q121 streaming at sf1 / sf10 / sf30 (2 runs) --"
scripts/run-tool.sh graft.tools.Profile target/sf1 2 q121_stream_dead_letter 2>/dev/null
scripts/run-tool.sh graft.tools.Profile target/sf10 2 q121_stream_dead_letter 2>/dev/null
scripts/run-tool.sh graft.tools.Profile target/sf30 2 q121_stream_dead_letter 2>/dev/null
uptime
echo "== probes done =="
} > "$P" 2>&1
