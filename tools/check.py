#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 tools/check.py [sfDir] [outDir]

Runs each oracle SQL from outDir/oracle_sql.json in DuckDB over the
same parquet tables, loads the Spark result parquet, sorts columns by
name and rows by all columns, and compares cell values exactly
(floats: bit-exact unless both NaN). Prints a per-query PASS/FAIL
table and diffs for failures.

TYPE-STRICT: the driver's hasher distinguishes int64 from decimal128
(DuckDB types SUM(BIGINT) as HUGEINT -> Arrow decimal128), which a
plain to_pylist() compare erases (Python Decimal(5) == 5). This gate
therefore (a) compares Arrow column TYPE FAMILIES per column and
(b) tags Decimal cells so a decimal-vs-int value never compares
equal — an uncast aggregate in an oracle's final SELECT now FAILS
locally exactly like it fails on the driver (r7: a13_hll_distinct).

WALL-TIME TRIPWIRE: the r15/r16 empty-artifact failure mode was a
SILENT oracle-side time blowup (DuckDB CTE inlining grew the gate to
~14 min and the driver's budget was exceeded without a word — root
cause note in BENCH_NOTES.md "Oracle gate wall-time budget"). Every
run now times each oracle query and the gate total, writes them to
<outDir>/check_timing.json, and warns loudly past the budgets
(defaults: 120 s gate total, 10 s per query; override with
GRAFT_ORACLE_BUDGET_S / GRAFT_ORACLE_QUERY_BUDGET_S) naming the
offending queries — a creeping oracle now trips HERE, rounds before
it can starve the driver's gate.
"""
import json, os, sys, math, decimal, time
import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.dataset as ds
from pathlib import Path

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def type_family(t):
    """Collapse Arrow types into the families the driver treats as
    interchangeable (width/unit/tz), keeping the families it does NOT
    (int vs decimal vs float vs string) distinct."""
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{type_family(t.value_type)}>"
    if pa.types.is_struct(t):
        inner = ", ".join(f"{f.name}: {type_family(f.type)}" for f in t)
        return f"struct<{inner}>"
    return str(t)


def schema_families(table):
    return {f.name: type_family(f.type) for f in table.schema}


def norm(v):
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, decimal.Decimal):
        return ("decimal", v)
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

    t_gate = time.monotonic()
    oracle_s = {}
    n_pass = n_fail = 0
    for name in sorted(p.name for p in out_dir.iterdir() if p.is_dir()):
        spark_tbl = ds.dataset(str(out_dir / name), format="parquet").to_table()
        if name not in oracle:
            print(f"{name:28s} ROWS-ONLY  rows={spark_tbl.num_rows}")
            continue
        t_q = time.monotonic()
        try:
            duck_tbl = con.execute(oracle[name]).arrow()
        except Exception as e:
            oracle_s[name] = round(time.monotonic() - t_q, 3)
            print(f"{name:28s} ORACLE-ERR {e}")
            n_fail += 1
            continue
        oracle_s[name] = round(time.monotonic() - t_q, 3)
        sc, sr = rows_of(spark_tbl)
        dc, dr = rows_of(duck_tbl)
        sf, df_ = schema_families(spark_tbl), schema_families(duck_tbl)
        if sc != dc:
            print(f"{name:28s} FAIL cols spark={sc} duck={dc}")
            n_fail += 1
        elif sf != df_:
            bad = {c: (sf[c], df_[c]) for c in sc if sf[c] != df_[c]}
            print(f"{name:28s} FAIL types (spark, duck) per col: {bad}")
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
    total_s = round(time.monotonic() - t_gate, 3)
    budget_total = float(os.environ.get("GRAFT_ORACLE_BUDGET_S", "120"))
    budget_query = float(os.environ.get("GRAFT_ORACLE_QUERY_BUDGET_S", "10"))
    slow = sorted((s, q) for q, s in oracle_s.items() if s > budget_query)
    timing = {
        "gate_total_s": total_s,
        "oracle_total_s": round(sum(oracle_s.values()), 3),
        "budget_total_s": budget_total,
        "budget_query_s": budget_query,
        "over_query_budget": [q for _, q in reversed(slow)],
        "oracle_s": dict(sorted(oracle_s.items(),
                                key=lambda kv: -kv[1])),
    }
    (out_dir / "check_timing.json").write_text(
        json.dumps(timing, indent=1))
    if slow:
        worst = ", ".join(f"{q}={s:.1f}s" for s, q in reversed(slow[-5:]))
        print(f"[oracle-tripwire] {len(slow)} oracle quer"
              f"{'y' if len(slow) == 1 else 'ies'} over the "
              f"{budget_query:g}s per-query budget: {worst} — DuckDB "
              "inlines non-recursive CTEs (two refs/level = 2^k "
              "blowup); MATERIALIZE any CTE referenced more than once "
              "(BENCH_NOTES.md 'Oracle gate wall-time budget')")
    if total_s > budget_total:
        print(f"[oracle-tripwire] gate total {total_s:.1f}s exceeds "
              f"the {budget_total:g}s budget — the r15/r16 silent-"
              "starvation mode; trim the slowest oracles "
              "(check_timing.json has the per-query ranking) before "
              "the driver's gate starves again")
    print(f"\n{n_pass} pass / {n_fail} fail  "
          f"(gate {total_s:.1f}s, oracle {timing['oracle_total_s']:.1f}s)")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
