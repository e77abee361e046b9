#!/bin/bash
# Round-14 probes -> probe_r14.txt
#   A: q157 isolated decades AFTER the persisted MinHash-signature
#      artifact (r13 verdict item 2; r13 isolated curve: ~35.6 s sf1,
#      125-172 s sf10 — mostly re-signing the corpus). Run 1 at each SF
#      is the COLD artifact build; run 2+ is the production shape (scan).
#   B: decade rows for the new operators q164 (multi-probe IVF),
#      q165 (compaction), q166 (erasure) — cost model: q164 ~ one
#      assignment map + nprobe cells; q165 ~ one narrow shuffle of the
#      index; q166 ~ affected partitions only (plus per-invocation
#      fixture copy at these SFs).
#   C: the artifact's effect on the signature-pair family measured at
#      the bench SF: q34 (pair mining), q127/q149 (admission) at sf0.1.
cd /root/repo
exec > >(tee probe_r14.txt) 2>&1
echo "== probe_r14 $(date -u +%H:%M:%SZ) load=$(cut -d' ' -f1 /proc/loadavg) =="

echo "--- decade data (documents+embeddings only) ---"
[ -d target/sf1/documents.parquet ] || scripts/run-tool.sh graft.tools.ScaleUp /root/testdata/sf0.1 target/sf1 10 documents,embeddings 2>/dev/null | grep scaleup
[ -d target/sf10/documents.parquet ] || scripts/run-tool.sh graft.tools.ScaleUp /root/testdata/sf0.1 target/sf10 100 documents,embeddings 2>/dev/null | grep scaleup

echo "--- A: q157 isolated decades (artifact: run1 = cold build, run2+ = warm scan) ---"
scripts/run-tool.sh graft.tools.Profile target/sf1 3 q157_lsh_canary 2>/dev/null
scripts/run-tool.sh graft.tools.Profile target/sf10 3 q157_lsh_canary 2>/dev/null

echo "--- B: new-operator decades (q164/q165/q166) ---"
scripts/run-tool.sh graft.tools.Profile /root/testdata/sf0.1 3 q164_ivf_multiprobe q165_ivf_compaction q166_vector_erasure 2>/dev/null
scripts/run-tool.sh graft.tools.Profile target/sf1 2 q164_ivf_multiprobe q165_ivf_compaction q166_vector_erasure 2>/dev/null
scripts/run-tool.sh graft.tools.Profile target/sf10 2 q164_ivf_multiprobe q165_ivf_compaction q166_vector_erasure 2>/dev/null

echo "--- C: signature-pair family at sf0.1 (artifact-sourced; r13 records: q34 2.9s, q127 2.6s, q149 6.5s, q151 3.4s, q157 7.0s) ---"
scripts/run-tool.sh graft.tools.Profile /root/testdata/sf0.1 3 q34_minhash_lsh_pairs q127_delta_dedup q149_stream_admission q151_lsh_quality q157_lsh_canary 2>/dev/null

echo "== done $(date -u +%H:%M:%SZ) load=$(cut -d' ' -f1 /proc/loadavg) =="
