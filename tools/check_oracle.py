#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the sf parquet tables and compare (sorted columns, sorted rows,
exact values) against the Verify parquet dumps."""
import json
import math
import sys
from pathlib import Path

import duckdb
import pyarrow.parquet as pq

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT_DIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = Path(SF_DIR) / f"{t}.parquet"
    if p.exists():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.loads((Path(OUT_DIR) / "oracle_sql.json").read_text())

def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bool):
        return repr(int(v))
    return repr(v)

def norm_table(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out)

n_pass = n_fail = 0
for name, sql in sorted(oracle.items()):
    spark_dir = Path(OUT_DIR) / name
    files = list(spark_dir.glob("*.parquet")) if spark_dir.exists() else []
    if not files:
        print(f"[MISS] {name}: no spark output")
        n_fail += 1
        continue
    tbl = pq.read_table(spark_dir)
    s_cols = tbl.column_names
    s_rows = [tuple(row) for row in zip(*[c.to_pylist() for c in tbl.columns])] \
        if tbl.num_rows else []
    try:
        res = con.execute(sql)
        d_cols = [d[0] for d in res.description]
        d_rows = res.fetchall()
    except Exception as e:
        print(f"[ORA-ERR] {name}: {e}")
        n_fail += 1
        continue
    sc, sr = norm_table(s_cols, s_rows)
    dc, dr = norm_table(d_cols, d_rows)
    if sc != dc:
        print(f"[SCHEMA] {name}: spark={sc} duck={dc}")
        n_fail += 1
    elif len(sr) != len(dr):
        print(f"[ROWS] {name}: spark={len(sr)} duck={len(dr)}")
        for a in sr[:3]: print("  s:", a)
        for b in dr[:3]: print("  d:", b)
        n_fail += 1
    elif sr != dr:
        diffs = [(a, b) for a, b in zip(sr, dr) if a != b]
        print(f"[VALUES] {name}: {len(diffs)}/{len(sr)} rows differ; first 3:")
        for a, b in diffs[:3]:
            print("  s:", a)
            print("  d:", b)
        n_fail += 1
    else:
        print(f"[OK] {name}: {len(sr)} rows")
        n_pass += 1
print(f"== {n_pass} pass, {n_fail} fail ==")
sys.exit(1 if n_fail else 0)
