#!/bin/bash
# Round-13 probes -> probe_r13.txt
#   A: the argmax-expression win measured across the whole vector family
#      at sf30 (r12 verdict item 1; r12 record for q152 was 38.8 s warm)
#   B: decade rows for the new operators q155/q156/q157 (q155 to sf100 -
#      documents-only dir; q157's recall leg must be non-NULL at scale)
#   C: q154 sf100 quiet re-probe (r12 verdict item 4; r12 sf30 was
#      mildly superlinear, the sf100 clean run was linear-class)
#   D: q149 re-measure at sf0.1 after the one-commit-per-batch rework
#      (r12 record 7.91 s; three commits per batch became one)
cd /root/repo
exec > >(tee probe_r13.txt) 2>&1
echo "== probe_r13 $(date -u +%H:%M:%SZ) load=$(cut -d' ' -f1 /proc/loadavg) =="

echo "--- A: vector family at sf30 (argmax expression; r12 q152=38.8s) ---"
scripts/run-tool.sh graft.tools.Profile target/sf30 3 q152_ivf_balance 2>/dev/null
scripts/run-tool.sh graft.tools.Profile target/sf30 2 q143_embedding_drift q144_ann_recall 2>/dev/null
scripts/run-tool.sh graft.tools.Profile target/sf30 2 q43_ivf_topk q126_ivf_incremental 2>/dev/null

echo "--- B: new-operator decades ---"
scripts/run-tool.sh graft.tools.Profile /root/testdata/sf0.1 3 q155_apply_spans q156_index_coverage q157_lsh_canary 2>/dev/null
scripts/run-tool.sh graft.tools.Profile target/sf1 2 q155_apply_spans q156_index_coverage q157_lsh_canary 2>/dev/null
scripts/run-tool.sh graft.tools.Profile target/sf10 2 q155_apply_spans q156_index_coverage q157_lsh_canary 2>/dev/null
scripts/run-tool.sh graft.tools.Profile target/sf30 2 q155_apply_spans 2>/dev/null
scripts/run-tool.sh graft.tools.Profile target/sf100 2 q155_apply_spans 2>/dev/null

echo "--- C: q154 sf100 quiet re-probe (r12: sf30 45.4s warm, sf100 clean run 155s) ---"
echo "load=$(cut -d' ' -f1 /proc/loadavg)"
scripts/run-tool.sh graft.tools.Profile target/sf30 2 q154_intra_doc_repetition 2>/dev/null
scripts/run-tool.sh graft.tools.Profile target/sf100 2 q154_intra_doc_repetition 2>/dev/null

echo "--- D: q149 at sf0.1 after the one-commit-per-batch rework (r12 record 7.91s) ---"
scripts/run-tool.sh graft.tools.Profile /root/testdata/sf0.1 3 q149_stream_admission 2>/dev/null

echo "== done $(date -u +%H:%M:%SZ) load=$(cut -d' ' -f1 /proc/loadavg) =="
