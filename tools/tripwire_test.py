#!/usr/bin/env python3
"""Fixture test for check.py's oracle wall-time tripwire.

Builds a one-query gate whose oracle is DELIBERATELY slow relative
to a tight budget (a 64M-row cross-product aggregate, a few hundred
ms, vs a 50 ms budget) and asserts the tripwire names it, the timing
artifact lands, and a comfortable budget stays silent.
Run: python3 tools/tripwire_test.py
"""
import json, os, subprocess, sys, tempfile
from pathlib import Path

import duckdb

HERE = Path(__file__).resolve().parent
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
SLOW_SQL = ("SELECT CAST(SUM(a.i * b.i) % 1000003 AS BIGINT) AS n "
            "FROM range(8000) a(i), range(8000) b(i)")


def run(env_extra, sf, out):
    env = dict(os.environ, **env_extra)
    p = subprocess.run(
        [sys.executable, str(HERE / "check.py"), str(sf), str(out)],
        capture_output=True, text=True, env=env)
    return p


def main():
    with tempfile.TemporaryDirectory() as tmp:
        sf = Path(tmp) / "sf"
        out = Path(tmp) / "out"
        (out / "q_slow").mkdir(parents=True)
        sf.mkdir()
        con = duckdb.connect()
        for t in TABLES:
            con.execute(f"COPY (SELECT 1 AS x) TO '{sf}/{t}.parquet'")
        con.execute(f"COPY ({SLOW_SQL}) TO '{out}/q_slow/r.parquet'")
        (out / "oracle_sql.json").write_text(
            json.dumps({"q_slow": SLOW_SQL}))

        # tight budgets: the slow oracle must trip BOTH warnings
        p = run({"GRAFT_ORACLE_BUDGET_S": "0.05",
                 "GRAFT_ORACLE_QUERY_BUDGET_S": "0.05"}, sf, out)
        assert p.returncode == 0, p.stdout + p.stderr
        assert "q_slow" in p.stdout and "PASS" in p.stdout, p.stdout
        assert "[oracle-tripwire]" in p.stdout and \
            "per-query budget: q_slow=" in p.stdout, p.stdout
        assert "gate total" in p.stdout and "exceeds" in p.stdout, p.stdout
        timing = json.loads((out / "check_timing.json").read_text())
        assert timing["over_query_budget"] == ["q_slow"], timing
        assert timing["oracle_s"]["q_slow"] > 0.05, timing
        assert timing["gate_total_s"] >= timing["oracle_s"]["q_slow"], timing

        # comfortable budgets: same gate, no warnings
        q = run({"GRAFT_ORACLE_BUDGET_S": "120",
                 "GRAFT_ORACLE_QUERY_BUDGET_S": "30"}, sf, out)
        assert q.returncode == 0 and "[oracle-tripwire]" not in q.stdout, \
            q.stdout
    print("tripwire_test: OK")


if __name__ == "__main__":
    main()
