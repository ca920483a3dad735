#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 tools/check.py [sfDir] [outDir]

Runs each oracle SQL from outDir/oracle_sql.json in DuckDB over the
same parquet tables, loads the Spark result parquet, sorts columns by
name and rows by all columns, and compares cell values exactly
(floats: bit-exact unless both NaN). Prints a per-query PASS/FAIL
table and diffs for failures.
"""
import json, sys, math
import duckdb
import pyarrow.parquet as pq
import pyarrow.dataset as ds
from pathlib import Path

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


def rows_of(table):
    cols = sorted(table.column_names)
    table = table.select(cols)
    rows = [tuple(norm(v) for v in r) for r in
            zip(*[table.column(c).to_pylist() for c in cols])] if cols else []
    return cols, sorted(rows, key=lambda r: tuple(str(x) for x in r))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())

    n_pass = n_fail = 0
    for name in sorted(p.name for p in out_dir.iterdir() if p.is_dir()):
        spark_tbl = ds.dataset(str(out_dir / name), format="parquet").to_table()
        if name not in oracle:
            print(f"{name:28s} ROWS-ONLY  rows={spark_tbl.num_rows}")
            continue
        try:
            duck_tbl = con.execute(oracle[name]).arrow()
        except Exception as e:
            print(f"{name:28s} ORACLE-ERR {e}")
            n_fail += 1
            continue
        sc, sr = rows_of(spark_tbl)
        dc, dr = rows_of(duck_tbl)
        if sc != dc:
            print(f"{name:28s} FAIL cols spark={sc} duck={dc}")
            n_fail += 1
        elif sr != dr:
            n_fail += 1
            print(f"{name:28s} FAIL rows spark={len(sr)} duck={len(dr)}")
            for i, (a, b) in enumerate(zip(sr, dr)):
                if a != b:
                    print(f"   first diff at row {i}:\n   spark={a}\n   duck ={b}")
                    break
            else:
                k = min(len(sr), len(dr))
                print(f"   extra rows from {k}: "
                      f"{sr[k:k+2] if len(sr) > k else dr[k:k+2]}")
        else:
            n_pass += 1
            print(f"{name:28s} PASS rows={len(sr)}")
    print(f"\n{n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
