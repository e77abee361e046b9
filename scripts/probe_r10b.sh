#!/bin/bash
# Round-10 follow-up probes (after the adaptive q112 route and the q126
# stride parameter landed):
#   batch 1: sf30 denominators for the fifth-decade dedup family
#            (q30/q32/q34 had no r9 sf30 rows)
#   batch 2: routed q112 decades — the adaptive route picks the brute
#            plan on this bounded-tail corpus; decades must track q32's
#   batch 3: sf30 decades for q127-q135 (the killed batch-5 leg, minus
#            q126 whose fixed-stride config is the measured knee)
#   batch 4: q126 production recipe (cells ~ sqrt(n)) at sf1/sf10/sf30
#            vs the gate stride at sf1/sf10 for the knee record
cd /root/repo
P=probe_r10b.txt
{
echo "== Round-10 follow-up probes =="
echo "-- batch 1: sf30 q30/q32/q34 (fifth-decade denominators) --"; uptime
scripts/run-tool.sh graft.tools.Profile target/sf30 2 q30_dedup_exact q32_jaccard_pairs q34_minhash_lsh_pairs 2>/dev/null
uptime
echo "-- batch 2: routed q112 at sf10 / sf30 / sf100 --"
scripts/run-tool.sh graft.tools.Profile target/sf10 3 q112_prefix_jaccard 2>/dev/null
scripts/run-tool.sh graft.tools.Profile target/sf30 2 q112_prefix_jaccard 2>/dev/null
uptime
echo "-- batch 3: sf30 decades for q127-q135 --"
scripts/run-tool.sh graft.tools.Profile target/sf30 2 q127_delta_dedup q128_cluster_reps q129_table_profile q130_fk_audit q131_erasure_cascade q132_gap_fill q133_path_transitions q134_attribution q135_rolling_anomaly 2>/dev/null
uptime
echo "-- batch 4: q126 stride recipe (cells ~ sqrt n) vs gate stride --"
scripts/run-tool.sh graft.tools.IvfIncrProbe target/sf1 100 2 2>/dev/null
scripts/run-tool.sh graft.tools.IvfIncrProbe target/sf1 140 2 2>/dev/null
scripts/run-tool.sh graft.tools.IvfIncrProbe target/sf10 425 3 2>/dev/null
scripts/run-tool.sh graft.tools.IvfIncrProbe target/sf30 735 2 2>/dev/null
uptime
echo "== follow-up probes done =="
} > "$P" 2>&1
