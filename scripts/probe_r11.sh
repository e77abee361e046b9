#!/bin/bash
# Round-11 probes:
#   batch 1: q126 incremental-IVF decades on the DEFAULT path
#            (self-sized stride ~sqrt(n); r10 verdict item 2 "done"
#            condition: n^1.5, not the fixed-stride n^2 knee)
#   batch 2: q130 FK audit at sf10/sf30 with the size-routed edges
#            (r10 verdict item 1 "done": sf10 probe row; r10's sf30
#            row was 4.4x and pre-dated both the Bloom fact edge and
#            the AQE width rule)
#   batch 3: q132/q133 sf30 re-probe post-AQE-width rule (r10 verdict
#            item 5: their >3x sf30 legs were measured before
#            initialPartitionNum=256 landed)
#   batch 4: the r11 operators' decades: q142 dedup-delta (rides the
#            shared LSH pipeline), q143 embedding drift, q144 ANN
#            recall at sf1/sf10
cd /root/repo
P=probe_r11.txt
{
echo "== Round-11 probes =="
echo "-- batch 1: IvfIncrProbe DEFAULT stride (0 = ~sqrt(n)) --"; uptime
scripts/run-tool.sh graft.tools.IvfIncrProbe /root/testdata/sf0.1 0 3 2>/dev/null
scripts/run-tool.sh graft.tools.IvfIncrProbe target/sf1 0 3 2>/dev/null
uptime
scripts/run-tool.sh graft.tools.IvfIncrProbe target/sf10 0 2 2>/dev/null
uptime
echo "-- batch 2: q130 size-routed FK audit decades (r10 sf30: 4.4x sf10) --"
scripts/run-tool.sh graft.tools.Profile target/sf1 3 q130_fk_audit 2>/dev/null
scripts/run-tool.sh graft.tools.Profile target/sf10 3 q130_fk_audit 2>/dev/null
uptime
scripts/run-tool.sh graft.tools.Profile target/sf30 2 q130_fk_audit 2>/dev/null
uptime
echo "-- batch 3: q132/q133 sf30 re-probe post-AQE width rule --"
scripts/run-tool.sh graft.tools.Profile target/sf10 3 q132_gap_fill q133_path_transitions 2>/dev/null
uptime
scripts/run-tool.sh graft.tools.Profile target/sf30 2 q132_gap_fill q133_path_transitions 2>/dev/null
uptime
echo "-- batch 4: r11 operators' decades --"
scripts/run-tool.sh graft.tools.Profile /root/testdata/sf0.1 3 q142_dedup_delta q143_embedding_drift q144_ann_recall 2>/dev/null
uptime
scripts/run-tool.sh graft.tools.Profile target/sf1 3 q142_dedup_delta q143_embedding_drift q144_ann_recall 2>/dev/null
uptime
scripts/run-tool.sh graft.tools.Profile target/sf10 2 q142_dedup_delta q143_embedding_drift q144_ann_recall 2>/dev/null
uptime
echo "== probes done =="
} > "$P" 2>&1
