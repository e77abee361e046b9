#!/bin/bash
# Round-10 probes (quiet window — machine freshly rebooted, no external
# load observed; uptime stamped between batches):
#   batch 1: quiet-window re-measure of the three r8->r9 bench
#            regressions (q109/q61/q66, verdict item 2) at sf0.1
#   batch 2: q112 fresh sf10/sf30 decades with the PPJoin length +
#            positional filters and packed (ns, ns-rn) ids (verdict
#            item 1's "done" condition: wall <= data growth)
#   batch 3: FIFTH decade (sf100 = 6M docs, documents-only corpus) for
#            the flagship dedup family q30/q32/q34/q105/q107
#   batch 4: SemDeDup end-to-end at sf10 with k prop. n (k=512) + the
#            candidate-per-vector audit (verdict item 5)
#   batch 5: decades for the round-10 operators q126-q135 at
#            sf1/sf10/sf30
#   batch 6: q112 at sf100 (last: the one leg that may still be
#            superlinear; 1 run)
cd /root/repo
P=probe_r10.txt
{
echo "== Round-10 probes =="
echo "-- batch 1: quiet re-measure q109/q61/q66 at sf0.1 (r8: 1.62/2.07/0.95 s; r9: 2.04/2.77/1.23 s) --"; uptime
scripts/run-tool.sh graft.tools.Profile /root/testdata/sf0.1 5 q109_bpe_train q61_media_decode_summary q66_image_resize 2>/dev/null
uptime
echo "-- batch 2: q112 fresh decades (r9: sf10 44.80 s, sf30 261.1 s) --"
scripts/run-tool.sh graft.tools.Profile target/sf10 3 q112_prefix_jaccard 2>/dev/null
uptime
scripts/run-tool.sh graft.tools.Profile target/sf30 2 q112_prefix_jaccard 2>/dev/null
uptime
echo "-- batch 3: sf100 fifth decade, dedup family (sf30 mins r9: q105 31.5, q107 28.2) --"
scripts/run-tool.sh graft.tools.Profile target/sf100 2 q30_dedup_exact q32_jaccard_pairs q34_minhash_lsh_pairs q105_dup_spans 2>/dev/null
uptime
scripts/run-tool.sh graft.tools.Profile target/sf100 2 q107_cluster_split 2>/dev/null
uptime
echo "-- batch 4: SemDeDup production-k at sf10 (k=512, occupancy ~117) --"
scripts/run-tool.sh graft.tools.SemDedupProbe target/sf10 512 3 2>/dev/null
uptime
echo "-- batch 5: round-10 operator decades --"
scripts/run-tool.sh graft.tools.Profile target/sf1 3 q126_ivf_incremental q127_delta_dedup q128_cluster_reps q129_table_profile q130_fk_audit q131_erasure_cascade q132_gap_fill q133_path_transitions q134_attribution q135_rolling_anomaly 2>/dev/null
uptime
scripts/run-tool.sh graft.tools.Profile target/sf10 3 q126_ivf_incremental q127_delta_dedup q128_cluster_reps q129_table_profile q130_fk_audit q131_erasure_cascade q132_gap_fill q133_path_transitions q134_attribution q135_rolling_anomaly 2>/dev/null
uptime
scripts/run-tool.sh graft.tools.Profile target/sf30 2 q126_ivf_incremental q127_delta_dedup q128_cluster_reps q129_table_profile q130_fk_audit q131_erasure_cascade q132_gap_fill q133_path_transitions q134_attribution q135_rolling_anomaly 2>/dev/null
uptime
echo "-- batch 6: q112 at sf100 (1 run; may be long) --"
scripts/run-tool.sh graft.tools.Profile target/sf100 1 q112_prefix_jaccard 2>/dev/null
uptime
echo "== probes done =="
} > "$P" 2>&1
