#!/usr/bin/env python3
"""Local pre-flight mirror of the driver's correctness gate.

Runs graft.Verify (Spark) on a sf dir, then replays every oracle_sql.json
query in DuckDB over the same parquet tables and compares:
  - row count, column names (sorted), and a value hash per query.

Usage: python3 tools/check_oracle.py [sfDir] [outDir]
"""
import json, math, subprocess, sys, hashlib
from pathlib import Path

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.6g}"
    if isinstance(v, int):
        return str(v)
    return str(v)


def table_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main():
    if "--no-run" not in sys.argv:
        r = subprocess.run(
            ["sbt", "-batch", f'runMain graft.Verify {SF} {OUT}'],
            cwd="/root/repo", capture_output=True, text=True)
        sys.stdout.write(r.stdout[-3000:])
        if r.returncode != 0:
            print(r.stderr[-3000:])
            sys.exit(1)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

    oracle = json.loads((OUT / "oracle_sql.json").read_text())
    spark_dirs = {p.name for p in OUT.iterdir() if p.is_dir()}
    fails = 0
    for name in sorted(spark_dirs):
        sq = con.execute(f"SELECT * FROM '{OUT}/{name}/*.parquet'")
        scols = [d[0] for d in sq.description]
        srows = sq.fetchall()
        if name not in oracle:
            print(f"  ~ {name:38s} rows-only ({len(srows)} rows)"
                  + ("  !! EMPTY" if not srows else ""))
            fails += 0 if srows else 1
            continue
        try:
            oq = con.execute(oracle[name])
            ocols = [d[0] for d in oq.description]
            orows = oq.fetchall()
        except Exception as e:
            print(f"  X {name:38s} oracle SQL error: {e}")
            fails += 1
            continue
        ok_cols = sorted(scols) == sorted(ocols)
        ok_rows = len(srows) == len(orows)
        ok_hash = ok_cols and ok_rows and table_hash(srows, scols) == table_hash(orows, ocols)
        if ok_hash:
            print(f"  ✓ {name:38s} {len(srows)} rows")
        else:
            fails += 1
            print(f"  X {name:38s} cols={ok_cols} rows={len(srows)}vs{len(orows)} hash={ok_hash}")
            if not ok_cols:
                print(f"      spark={sorted(scols)}\n      duck ={sorted(ocols)}")
            elif srows and orows:
                sset = {tuple(map(norm, r)) for r in srows}
                oset = {tuple(map(norm, r)) for r in orows}
                so = sorted(sset - oset)[:3]
                os_ = sorted(oset - sset)[:3]
                print(f"      spark-only: {so}\n      duck-only : {os_}")
    missing = set(oracle) - spark_dirs
    for name in sorted(missing):
        print(f"  X {name:38s} spark result MISSING (query failed?)")
        fails += 1
    print(("FAIL %d" % fails) if fails else "ALL OK")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
