#!/bin/bash
# Round-14c probes -> probe_r14c.txt: decade rows for the ten new
# operators of the r14 second window —
#   q178 (binary Hamming top-k ~ one 8-byte-sketch scan vs broadcast probes),
#   q179 (two-stage ~ q178 + a |probes|x50 rerank join),
#   q180 (contrastive mining ~ one scan vs <=64 broadcast anchors,
#         |anchors|-bounded conditional max_by shuffle),
#   q181 (token budget ~ one scan -> bounded (source,score) histogram),
#   q182 (streaming drift monitor ~ 3-wave latency floor + |langs| aggs),
#   q183 (KMV profiler ~ ONE scan, 4x256-long state, no Expand),
#   q184 (index digest ~ two linear scans -> |cells|-row compare;
#         run1 at each SF pays the one-time fixture build),
#   q185 (mixture apply ~ two scans, never shuffles the corpus),
#   q186 (curriculum ~ q172's shard shuffle + score join),
#   q187 (normalized dedup ~ two fingerprint aggs over corpus+twins).
cd /root/repo
exec > >(tee probe_r14c.txt) 2>&1
echo "== probe_r14c $(date -u +%H:%M:%SZ) load=$(cut -d' ' -f1 /proc/loadavg) =="

echo "--- decade data (documents+embeddings only) ---"
[ -d target/sf1/documents.parquet ] || scripts/run-tool.sh graft.tools.ScaleUp /root/testdata/sf0.1 target/sf1 10 documents,embeddings 2>/dev/null | grep scaleup
[ -d target/sf10/documents.parquet ] || scripts/run-tool.sh graft.tools.ScaleUp /root/testdata/sf0.1 target/sf10 100 documents,embeddings 2>/dev/null | grep scaleup

QS="q178_hamming_topk q179_two_stage q180_contrastive_mine q181_token_budget q182_stream_drift q183_profile_kmv q184_ivf_digest q185_mixture_apply q186_curriculum q187_norm_dedup"
echo "--- sf0.1 (3 passes) ---"
scripts/run-tool.sh graft.tools.Profile /root/testdata/sf0.1 3 $QS 2>/dev/null
echo "--- sf1 (2 passes) ---"
scripts/run-tool.sh graft.tools.Profile target/sf1 2 $QS 2>/dev/null
echo "--- sf10 (2 passes) ---"
scripts/run-tool.sh graft.tools.Profile target/sf10 2 $QS 2>/dev/null

echo "== done $(date -u +%H:%M:%SZ) load=$(cut -d' ' -f1 /proc/loadavg) =="
