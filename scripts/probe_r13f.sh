#!/bin/bash
# Round-13 probes, part 6 -> probe_r13f.txt: decade completion rows —
# q157 (delta shape) at sf10, q158/q160/q162 at sf30.
cd /root/repo
exec > >(tee probe_r13f.txt) 2>&1
echo "== probe_r13f $(date -u +%H:%M:%SZ) load=$(cut -d' ' -f1 /proc/loadavg) =="
scripts/run-tool.sh graft.tools.Profile target/sf10 2 q157_lsh_canary 2>/dev/null
scripts/run-tool.sh graft.tools.Profile target/sf30 2 q158_apply_contamination q160_hybrid_rrf q162_fusion_diag 2>/dev/null
echo "== done $(date -u +%H:%M:%SZ) load=$(cut -d' ' -f1 /proc/loadavg) =="
