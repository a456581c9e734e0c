#!/usr/bin/env python3
"""Digest gate: multiset-equality check for queries whose row-exact
compare (or whose oracle's full materialization) is infeasible at a
given scale — the e10 pattern from round 12, made reusable.

Both sides are aggregated IN DuckDB to (row count, per-row-hash sum,
and per-numeric-column sums): the Spark side over the parquet that
`graft.Verify` dumped, the oracle side over the oracle SQL run as a
subquery — so the oracle's final ORDER BY never has to materialize a
sorted result and the Python process never holds rows. Equal digests
= multiset equality of the full result (64-bit row hashes summed in
128-bit; a collision would need an adversarial row pair).

Columns are sorted by name before hashing, mirroring the driver's
compare. Float columns ARE hashed (DuckDB hashes the binary value, and
both digest sides run in the same engine — exactly as strict as the
driver's bitwise-float compare) but are EXCLUDED from the per-column
sums, where float addition's order-dependence would make equal
multisets digest differently.

Usage: digest_gate.py <sfDir> <verifyOutDir> <name...> [--temp-gb N]

Dev/measurement tool only — the Scala library has no Python dependency.
"""
import json
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def connect(sf_dir, temp_gb):
    con = duckdb.connect()
    con.execute(f"SET max_temp_directory_size='{temp_gb}GB'")
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


def digest_sql(cols_types, source):
    cols = sorted(c for c, _ in cols_types)
    row = "hash(ROW(" + ", ".join(f'"{c}"' for c in cols) + "))"
    sums = []
    for c, t in sorted(cols_types):
        if any(k in t.upper() for k in
               ("INT", "DECIMAL", "HUGEINT", "UBIGINT")):
            sums.append(f'sum("{c}"::HUGEINT)')
    extra = (", " + ", ".join(sums)) if sums else ""
    return (f"SELECT count(*)::HUGEINT, sum(({row})::HUGEINT){extra} "
            f"FROM {source}")


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    temp_gb = 40
    for a in sys.argv[1:]:
        if a.startswith("--temp-gb"):
            temp_gb = int(a.split("=", 1)[1])
    sf_dir, out_dir, names = args[0], args[1], args[2:]
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    con = connect(sf_dir, temp_gb)
    failures = 0
    for name in names:
        glob = f"{Path(out_dir) / name}/*.parquet"
        cols_types = [(r[0], r[1]) for r in con.execute(
            f"DESCRIBE SELECT * FROM '{glob}'").fetchall()]
        spark_d = con.execute(
            digest_sql(cols_types, f"'{glob}'")).fetchone()
        try:
            oracle_d = con.execute(digest_sql(
                cols_types, f"({oracle[name]}) AS oracle_sub")).fetchone()
        except Exception as e:  # noqa: BLE001 — report, keep gating
            print(f"[FAIL] {name}: oracle digest error: {e}")
            failures += 1
            continue
        if spark_d == oracle_d:
            print(f"[PASS] {name} digest: rows={spark_d[0]} "
                  f"rowhash_sum={spark_d[1]} colsums={list(spark_d[2:])}")
        else:
            print(f"[FAIL] {name}: spark={spark_d} oracle={oracle_d}")
            failures += 1
    print(f"{len(names) - failures} pass / {failures} fail (digest)")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
