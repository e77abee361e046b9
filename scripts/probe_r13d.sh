#!/bin/bash
# Round-13 probes, part 4 -> probe_r13d.txt: q160/q161 decade rows.
cd /root/repo
exec > >(tee probe_r13d.txt) 2>&1
echo "== probe_r13d $(date -u +%H:%M:%SZ) load=$(cut -d' ' -f1 /proc/loadavg) =="
scripts/run-tool.sh graft.tools.Profile /root/testdata/sf0.1 3 q160_hybrid_rrf q161_stream_index 2>/dev/null
scripts/run-tool.sh graft.tools.Profile target/sf1 2 q160_hybrid_rrf q161_stream_index 2>/dev/null
scripts/run-tool.sh graft.tools.Profile target/sf10 2 q160_hybrid_rrf q161_stream_index 2>/dev/null
echo "== done $(date -u +%H:%M:%SZ) load=$(cut -d' ' -f1 /proc/loadavg) =="
