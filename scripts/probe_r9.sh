#!/bin/bash
# Round-9 fourth-decade probes: q102-q112 families at sf30 (verdict item
# 4) + first decade coverage for the round-9-new q113-q116.
cd /root/repo
P=probe_sf30_r9.txt
{
echo "== Round-9 probes: sf30 fourth decade (q102-q112) + q113-q116 decades =="
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
echo "-- batch 4: new ops q113/q114/q116 at sf1 / sf10 / sf30 --"
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
echo "== probes done =="
} >> "$P" 2>&1
