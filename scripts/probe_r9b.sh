#!/bin/bash
# Round-9 probes, part 2 — after the two r9 performance fixes landed
# mid-probe (codegen k-means assignment kernel; q112 dictionary-encoded
# shingle ids). Covers what probe_sf30_r9.txt is missing:
#   q115 production-k decades (fixed kernel), q115 face decades,
#   q117-q122 decades, q121 streaming decades.
cd /root/repo
P=probe_r9b.txt
{
echo "== Round-9 probes part 2 (post-fix) =="
echo "-- q115 production-k, fixed kernel: sf1 k=256 / sf10 k=512 / sf30 k=1024 --"; uptime
scripts/run-tool.sh graft.tools.SemDedupProbe target/sf1 256 3 2>/dev/null
scripts/run-tool.sh graft.tools.SemDedupProbe target/sf10 512 2 2>/dev/null
scripts/run-tool.sh graft.tools.SemDedupProbe target/sf30 1024 2 2>/dev/null
uptime
echo "-- q115 gate face (fixed): sf0.1 / sf1 --"
scripts/run-tool.sh graft.tools.Profile /root/testdata/sf0.1 3 q115_semdedup 2>/dev/null
scripts/run-tool.sh graft.tools.Profile target/sf1 2 q115_semdedup 2>/dev/null
uptime
echo "-- q117-q120 + q122 at sf1 --"
scripts/run-tool.sh graft.tools.Profile target/sf1 3 q117_group_quantile_filter q118_dsir_resample q119_scd2_history q120_gram_matrix q122_auc_eval 2>/dev/null
uptime
echo "-- q117-q120 + q122 at sf10 --"
scripts/run-tool.sh graft.tools.Profile target/sf10 3 q117_group_quantile_filter q118_dsir_resample q119_scd2_history q120_gram_matrix q122_auc_eval 2>/dev/null
uptime
echo "-- q117-q120 + q122 at sf30 --"
scripts/run-tool.sh graft.tools.Profile target/sf30 2 q117_group_quantile_filter q118_dsir_resample q119_scd2_history q120_gram_matrix q122_auc_eval 2>/dev/null
uptime
echo "-- q121 streaming at sf1 / sf10 / sf30 (2 runs) --"
scripts/run-tool.sh graft.tools.Profile target/sf1 2 q121_stream_dead_letter 2>/dev/null
scripts/run-tool.sh graft.tools.Profile target/sf10 2 q121_stream_dead_letter 2>/dev/null
scripts/run-tool.sh graft.tools.Profile target/sf30 2 q121_stream_dead_letter 2>/dev/null
uptime
echo "== part 2 done =="
} > "$P" 2>&1
