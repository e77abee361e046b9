#!/bin/bash
# Round-13 probes, part 5 -> probe_r13e.txt: q162/q163 decade rows.
cd /root/repo
exec > >(tee probe_r13e.txt) 2>&1
echo "== probe_r13e $(date -u +%H:%M:%SZ) load=$(cut -d' ' -f1 /proc/loadavg) =="
scripts/run-tool.sh graft.tools.Profile /root/testdata/sf0.1 3 q162_fusion_diag q163_corpus_accounting 2>/dev/null
scripts/run-tool.sh graft.tools.Profile target/sf1 2 q162_fusion_diag q163_corpus_accounting 2>/dev/null
scripts/run-tool.sh graft.tools.Profile target/sf10 2 q162_fusion_diag q163_corpus_accounting 2>/dev/null
scripts/run-tool.sh graft.tools.Profile target/sf30 2 q163_corpus_accounting 2>/dev/null
echo "== done $(date -u +%H:%M:%SZ) load=$(cut -d' ' -f1 /proc/loadavg) =="
