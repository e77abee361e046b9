#!/bin/bash
# Round-13 probes, part 3 -> probe_r13c.txt
#   - ingest worker-scaling on Derby (1/2/4/8/16): does the SAME sink
#     scale with parallelism until the store saturates? (r12 item 6)
#   - DuckDB second-store rows through the identical sink
#   - q154 sf10+sf30 quiet re-probe (part-2's section C ran at load ~18
#     from its own q157 JVM residue; need a clean decade pair)
#   - q98/q109 isolated (the two window-confounded r12 watch items)
cd /root/repo
exec > >(tee probe_r13c.txt) 2>&1
echo "== probe_r13c $(date -u +%H:%M:%SZ) load=$(cut -d' ' -f1 /proc/loadavg) =="
DUCK=$(find /root/.cache/coursier -name "duckdb_jdbc-*.jar" | head -1)

echo "--- ingest worker scaling, Derby, sf0.1 (fresh JVM per point) ---"
for w in 1 2 4 8 16; do
  scripts/run-tool.sh graft.tools.JdbcIngestBench /root/testdata/sf0.1 derby $w 2>/dev/null | tail -1
done
echo "--- ingest second store: DuckDB via EXTRA_CP, same sink ---"
for i in 1 2; do
  EXTRA_CP="$DUCK" scripts/run-tool.sh graft.tools.JdbcIngestBench /root/testdata/sf0.1 duckdb 8 2>/dev/null | tail -1
done

echo "--- q154 decade pair, quiet ---"
echo "load=$(cut -d' ' -f1 /proc/loadavg)"
scripts/run-tool.sh graft.tools.Profile target/sf10 2 q154_intra_doc_repetition 2>/dev/null
echo "load=$(cut -d' ' -f1 /proc/loadavg)"
scripts/run-tool.sh graft.tools.Profile target/sf30 2 q154_intra_doc_repetition 2>/dev/null

echo "--- q98/q109 isolated (r12 watch items; targets <=3.5 / ~2.3-2.7) ---"
echo "load=$(cut -d' ' -f1 /proc/loadavg)"
scripts/run-tool.sh graft.tools.Profile /root/testdata/sf0.1 3 q98_pagerank q109_bpe_train 2>/dev/null

echo "== done $(date -u +%H:%M:%SZ) load=$(cut -d' ' -f1 /proc/loadavg) =="
