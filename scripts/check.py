#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run graft.Verify, then for
each query compare its parquet output against DuckDB running the oracle SQL
over the same testdata parquet. Column order is normalized (sorted by name),
rows are sorted by all columns, values hashed with light float rounding —
approximating the driver's compare so mismatches surface before round end.

Usage: python3 scripts/check.py [sfDir] [--skip-verify]
"""
import sys, os, json, subprocess, glob, math

SF = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") else "/root/testdata/sf0.01"
OUT = "/root/repo/target/verify_out"
REPO = "/root/repo"

def run_verify():
    cp = f"{REPO}/target/scala-2.13/classes:" + ":".join(glob.glob("/opt/spark/jars/*.jar"))
    opens = [f"--add-opens={p}=ALL-UNNAMED" for p in [
        "java.base/java.lang","java.base/java.lang.invoke","java.base/java.lang.reflect",
        "java.base/java.io","java.base/java.net","java.base/java.nio","java.base/java.util",
        "java.base/java.util.concurrent","java.base/java.util.concurrent.atomic",
        "java.base/sun.nio.ch","java.base/sun.nio.cs","java.base/sun.security.action",
        "java.base/sun.util.calendar"]]
    env = dict(os.environ, SPARK_GRAFT_CPUS="8")
    cmd = ["java"] + opens + ["-Xmx8g","-Dspark.ui.enabled=false",
           "-Dspark.sql.session.timeZone=UTC","-cp",cp,"graft.Verify",SF,OUT]
    r = subprocess.run(cmd, capture_output=True, text=True, env=env)
    for line in r.stderr.splitlines():
        if "[verify]" in line or "Exception" in line: print(line)
    if r.returncode != 0:
        print("VERIFY FAILED rc=", r.returncode); print(r.stderr[-3000:]); sys.exit(1)

def canon(v):
    if v is None: return "NULL"
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return f"{v:.6g}"
    if isinstance(v, bool): return str(v)
    return str(v)

def table_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    data = sorted(tuple(canon(r[i]) for i in order) for r in rows)
    return data

def main():
    if "--skip-verify" not in sys.argv:
        run_verify()
    import duckdb
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    oracle = json.load(open(f"{OUT}/oracle_sql.json"))
    ok = fail = 0
    queries = sorted(os.listdir(OUT))
    for name in queries:
        path = os.path.join(OUT, name)
        if not os.path.isdir(path): continue
        got = con.execute(f"SELECT * FROM '{path}/*.parquet'")
        gcols = [d[0] for d in got.description]; grows = got.fetchall()
        if name not in oracle:
            print(f"  {name}: rows={len(grows)} (no oracle — rows-only check: {'OK' if len(grows)>0 else 'EMPTY!'})")
            ok += 1 if len(grows) > 0 else 0; fail += 0 if len(grows) > 0 else 1
            continue
        try:
            exp = con.execute(oracle[name])
            ecols = [d[0] for d in exp.description]; erows = exp.fetchall()
            # TYPE AUDIT (the q49 class): DuckDB's sum(BIGINT) silently
            # returns HUGEINT, which the driver's pyarrow-side hash renders
            # differently from the engine's BIGINT even when values are
            # identical. Any oracle column surfacing as HUGEINT/DECIMAL is
            # a latent hash mismatch — fail it here, value-match or not.
            rel = con.sql(oracle[name])
            drifty = [(c, str(t)) for c, t in zip(rel.columns, rel.types)
                      if "HUGEINT" in str(t).upper() or "DECIMAL" in str(t).upper()]
            if drifty:
                print(f"  {name}: ORACLE TYPE DRIFT {drifty} — wrap in CAST(... AS BIGINT/DOUBLE)")
                fail += 1; continue
        except Exception as e:
            print(f"  {name}: ORACLE SQL ERROR: {e}"); fail += 1; continue
        if sorted(gcols) != sorted(ecols):
            print(f"  {name}: SCHEMA MISMATCH spark={sorted(gcols)} duck={sorted(ecols)}"); fail += 1; continue
        g, e = table_hash(grows, gcols), table_hash(erows, ecols)
        if len(g) != len(e):
            print(f"  {name}: ROWCOUNT MISMATCH spark={len(g)} duck={len(e)}"); fail += 1; continue
        if g != e:
            diffs = [(a, b) for a, b in zip(g, e) if a != b][:3]
            print(f"  {name}: VALUE MISMATCH e.g. {diffs}"); fail += 1; continue
        print(f"  {name}: OK ({len(g)} rows)"); ok += 1
    print(f"== {ok} ok, {fail} fail ==")
    sys.exit(1 if fail else 0)

main()
