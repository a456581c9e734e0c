#!/usr/bin/env python3
"""Serial-DuckDB yardstick: time every declared oracle SQL over one
testdata dir, the judge's denominator method for the bench ratio.

Usage: python3 tools/yardstick.py <sfDir> <oracle_sql.json> [passes]

Prints one JSON line per pass: {"pass":i,"total":sec,"queries":{...}},
then a summary with per-query minima and min/median totals, mirroring
graft.Bench's min-of-runs estimator so the two sides pair cleanly.

Dev/measurement tool only — the Scala library has no Python dependency.
"""
import json
import sys
import time
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def connect(sf_dir):
    con = duckdb.connect()
    con.execute("SET max_temp_directory_size='40GB'")
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if not p.exists():
            continue
        if p.is_dir():
            p = f"{p}/*.parquet"
        if t == "events":
            ttype = con.execute(
                f"DESCRIBE SELECT ts FROM '{p}'").fetchall()[0][1]
            if ttype == "BIGINT":
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * REPLACE "
                    f"(make_timestamp(ts // 1000) AS ts) FROM '{p}'")
                continue
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def main():
    sf_dir, oracle_path = sys.argv[1], sys.argv[2]
    passes = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    oracle = json.loads(Path(oracle_path).read_text())
    con = connect(sf_dir)
    per_query = {name: [] for name in sorted(oracle)}
    for i in range(passes):
        times = {}
        for name in sorted(oracle):
            t0 = time.perf_counter()
            con.sql(oracle[name]).fetchall()
            dt = time.perf_counter() - t0
            times[name] = round(dt, 4)
            per_query[name].append(dt)
        total = sum(times.values())
        print(json.dumps({"pass": i, "total": round(total, 3),
                          "queries": times}))
    mins = {n: round(min(ts), 4) for n, ts in per_query.items()}
    totals = sorted(round(sum(ts[i] for ts in per_query.values()), 3)
                    for i in range(passes))
    print(json.dumps({
        "summary": True, "sf": sf_dir, "passes": passes,
        "total_min_of_runs": round(sum(mins.values()), 3),
        "pass_totals_sorted": totals,
        "queries_min": mins}))


if __name__ == "__main__":
    main()
