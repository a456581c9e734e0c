#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify),
runs the matching oracle SQL from oracle_sql.json in DuckDB over the
parquet tables in <sfDir>, and compares: schema (sorted column names),
column TYPES (the driver hashes typed values, so INT64 vs HUGEINT or
INT32 vs INT64 is a real mismatch even when the values print the same
— this is exactly how td01/td10 slipped past round 1), row count, and
cell values (exact for non-floats; floats must match bitwise, since
the driver may hash raw values).

Dev tool only — the Scala library has no Python dependency.
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        return v
    return v


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    # Optional third arg: comma-separated query names to compare (for
    # re-running a subset at big scale factors, where one pathological
    # oracle — e.g. td08's quadratic banding SQL at 500k docs — would
    # otherwise block the rest).
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    con = duckdb.connect()
    # Fail fast instead of filling the disk when an oracle spills.
    con.execute("SET max_temp_directory_size='40GB'")
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if not p.exists():
            continue
        # driver dirs are single parquet FILES; Spark-written dirs
        # (graft.tools.ScaleGen) are directories of part files
        if p.is_dir():
            p = f"{p}/*.parquet"
        if t == "events":
            # Driver-generated dirs carry events.ts as TIMESTAMP(NANOS);
            # locally generated scale dirs (graft.tools.ScaleGen) carry it
            # as raw int64 nanos, because Spark cannot WRITE nanos
            # parquet. Normalize the raw form to a µs timestamp exactly
            # like the Spark reader (timestamp_micros(ts div 1000)).
            ttype = con.execute(
                f"DESCRIBE SELECT ts FROM '{p}'").fetchall()[0][1]
            if ttype == "BIGINT":
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * REPLACE "
                    f"(make_timestamp(ts // 1000) AS ts) FROM '{p}'")
                continue
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    n_pass = n_fail = 0
    names = sorted(d.name for d in Path(out_dir).iterdir() if d.is_dir())
    if only is not None:
        names = [n for n in names if n in only]
        oracle = {n: q for n, q in oracle.items() if n in only}
    for name in names:
        spark_rel = con.sql(
            f"SELECT * FROM '{Path(out_dir)}/{name}/*.parquet'")
        scols = sorted(spark_rel.columns)
        spark_rows = con.sql(
            "SELECT " + ", ".join(f'"{c}"' for c in scols) +
            f" FROM spark_rel").fetchall()
        if name not in oracle:
            print(f"[rows-only] {name}: {len(spark_rows)} rows "
                  f"(no oracle declared)")
            continue
        # One infeasible oracle (e.g. a quadratic pair-SQL at a big
        # scale factor blowing the temp cap) must not kill the batch.
        try:
            ora_rel = con.sql(oracle[name])
        except duckdb.Error as e:
            n_fail += 1
            print(f"[FAIL] {name}: oracle error: {e}")
            continue
        ocols = sorted(ora_rel.columns)
        status, notes = "PASS", []
        if scols != ocols:
            status = "FAIL"
            notes.append(f"schema: spark={scols} oracle={ocols}")
            ora_rows = None
        elif (stypes := [str(t) for _, t in
                         sorted(zip(spark_rel.columns, spark_rel.types))]) != \
             (otypes := [str(t) for _, t in
                         sorted(zip(ora_rel.columns, ora_rel.types))]):
            # Typed comparison: the driver hashes (type, value); HUGEINT
            # vs BIGINT or INT vs BIGINT fails there even when values
            # compare equal here.
            status = "FAIL"
            notes.append(f"types: spark={list(zip(scols, stypes))} "
                         f"oracle={list(zip(ocols, otypes))}")
            ora_rows = None
        else:
            try:
                ora_rows = con.sql(
                    "SELECT " + ", ".join(f'"{c}"' for c in ocols) +
                    f" FROM ora_rel").fetchall()
            except duckdb.Error as e:
                n_fail += 1
                print(f"[FAIL] {name}: oracle error: {e}")
                continue
            if len(spark_rows) != len(ora_rows):
                status = "FAIL"
                notes.append(f"rows: spark={len(spark_rows)} "
                             f"oracle={len(ora_rows)}")
            else:
                for i, (sr, orow) in enumerate(zip(spark_rows, ora_rows)):
                    for c, sv, ov in zip(ocols, sr, orow):
                        if sv == ov or (sv is None and ov is None):
                            continue
                        if isinstance(sv, float) and isinstance(ov, float):
                            if math.isnan(sv) and math.isnan(ov):
                                continue
                            # driver may hash raw values: near-miss is a bug
                            status = "FAIL"
                            notes.append(
                                f"row {i} col {c}: float mismatch "
                                f"spark={sv!r} oracle={ov!r} "
                                f"(diff={abs(sv - ov):.3e})")
                        else:
                            status = "FAIL"
                            notes.append(f"row {i} col {c}: "
                                         f"spark={sv!r} oracle={ov!r}")
                        if len(notes) > 5:
                            break
                    if len(notes) > 5:
                        break
        if status == "PASS":
            n_pass += 1
            print(f"[PASS] {name} ({len(spark_rows)} rows)")
        else:
            n_fail += 1
            print(f"[FAIL] {name}: " + "; ".join(notes))
    # Verify-side throw log (graft.Verify writes _errors.json): a query
    # that crashed has no output dir, so without this it would surface
    # only as "no spark output" with the cause lost.
    err_path = Path(out_dir) / "_errors.json"
    verify_errs = json.loads(err_path.read_text()) if err_path.exists() else {}
    missing = sorted(set(oracle) - set(names))
    for m in missing:
        n_fail += 1
        if m in verify_errs:
            print(f"[FAIL] {m}: verify threw: {verify_errs[m]}")
        else:
            print(f"[FAIL] {m}: oracle declared but no spark output")
    # A query that threw in Verify but has NO declared oracle would
    # otherwise vanish entirely (no output dir, not in the missing set).
    for m in sorted(set(verify_errs) - set(names) - set(missing)):
        if only is not None and m not in only:
            continue
        n_fail += 1
        print(f"[FAIL] {m}: verify threw (no oracle declared): "
              f"{verify_errs[m]}")
    print(f"\n{n_pass} pass / {n_fail} fail / {len(names)} outputs")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
