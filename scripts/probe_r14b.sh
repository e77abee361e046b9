#!/bin/bash
# Round-14b probes -> probe_r14b.txt
#   A: q157 isolated decades AFTER the r14 broadcast reshape of the
#      canary delta (the sf10 zip failure fix): every canary-side table
#      is sample-bounded and now broadcast, so the only corpus-scale
#      work left is the artifact scan + band probe. r14a could not
#      measure sf10 at all (the zip failure); r13's curve was 125-172 s.
#   B: decade rows for the five new operators —
#      q168 (nprobe auto-select ~ one widest-probe q164 + bounded joins),
#      q169 (filtered ANN ~ q164 at nprobe=2 + a label join),
#      q170 (block dedup ~ one count shuffle + size-routed flag join),
#      q171 (LM filter ~ q113 + a |sources| roll-up),
#      q172 (epoch shuffle ~ one shard shuffle + local sorts).
cd /root/repo
exec > >(tee probe_r14b.txt) 2>&1
echo "== probe_r14b $(date -u +%H:%M:%SZ) load=$(cut -d' ' -f1 /proc/loadavg) =="

echo "--- decade data (documents+embeddings only) ---"
[ -d target/sf1/documents.parquet ] || scripts/run-tool.sh graft.tools.ScaleUp /root/testdata/sf0.1 target/sf1 10 documents,embeddings 2>/dev/null | grep scaleup
[ -d target/sf10/documents.parquet ] || scripts/run-tool.sh graft.tools.ScaleUp /root/testdata/sf0.1 target/sf10 100 documents,embeddings 2>/dev/null | grep scaleup

echo "--- A: q157 isolated decades (run1 = cold artifact at that SF, run2+ = warm) ---"
scripts/run-tool.sh graft.tools.Profile target/sf1 3 q157_lsh_canary 2>/dev/null
scripts/run-tool.sh graft.tools.Profile target/sf10 3 q157_lsh_canary 2>/dev/null

echo "--- B: new-operator decades (q168-q172) ---"
scripts/run-tool.sh graft.tools.Profile /root/testdata/sf0.1 3 q168_nprobe_select q169_filtered_ann q170_block_dedup q171_lm_filter q172_epoch_shuffle 2>/dev/null
scripts/run-tool.sh graft.tools.Profile target/sf1 2 q168_nprobe_select q169_filtered_ann q170_block_dedup q171_lm_filter q172_epoch_shuffle 2>/dev/null
scripts/run-tool.sh graft.tools.Profile target/sf10 2 q168_nprobe_select q169_filtered_ann q170_block_dedup q171_lm_filter q172_epoch_shuffle 2>/dev/null

echo "== done $(date -u +%H:%M:%SZ) load=$(cut -d' ' -f1 /proc/loadavg) =="
