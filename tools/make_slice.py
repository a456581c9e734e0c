#!/usr/bin/env python3
"""Build a deterministic document-slice of an sf dir for oracle
verification at scales where the full DuckDB oracle is disk-infeasible
(round-15 measurement: td14/td23's self-join state exhausts a 58 GB
temp cap at sf100 while the Spark side is long green).

The slice keeps documents with `doc_id % mod = 0` and symlinks every
other table unchanged. Both engines then run the IDENTICAL declared
query + oracle SQL over the sliced dir: a self-join's state shrinks
~mod^2 (4096x at mod 64) while the plan SHAPE — shingle index,
band joins, anti-joins, aggregations — is exactly the one the full
corpus runs. Modulo (not hash) because doc_ids are dense, so the
slice is uniform, and the predicate is trivially identical in Spark
and DuckDB.

Usage: make_slice.py <sfDir> <outDir> [mod] [table]

`table` (default `documents`, key `doc_id`; or `embeddings`, key
`vec_id`) picks which table is sliced; every other table is
symlinked unchanged.

Dev/measurement tool only — the Scala library has no Python dependency.
"""
import json
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


KEYS = {"documents": "doc_id", "embeddings": "vec_id"}


def main():
    sf_dir, out_dir = Path(sys.argv[1]).resolve(), Path(sys.argv[2])
    mod = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    sliced = sys.argv[4] if len(sys.argv) > 4 else "documents"
    key = KEYS[sliced]
    out_dir.mkdir(parents=True, exist_ok=True)
    # a slice is only reusable if it was built from the same source
    # with the same modulus -- otherwise a rerun with a different mod
    # would silently verify against the stale corpus
    meta_p = out_dir / "slice_meta.json"
    meta = {"src": str(sf_dir), "mod": mod, "table": sliced}
    if meta_p.exists() and json.loads(meta_p.read_text()) != meta:
        sys.exit(f"{out_dir} holds a different slice "
                 f"({meta_p.read_text().strip()}); delete it or pick "
                 f"another outDir")
    for t in TABLES:
        src = sf_dir / f"{t}.parquet"
        if not src.exists():
            continue
        dst = out_dir / f"{t}.parquet"
        if dst.is_symlink() or dst.exists():
            continue
        if t == sliced:
            glob = f"{src}/*.parquet" if src.is_dir() else str(src)
            con = duckdb.connect()
            con.execute(
                f"COPY (SELECT * FROM '{glob}' WHERE {key} % {mod} = 0) "
                f"TO '{dst}' (FORMAT PARQUET)")
            n = con.execute(f"SELECT count(*) FROM '{dst}'").fetchone()[0]
            print(f"{sliced} slice: {n} rows (mod {mod})")
        else:
            dst.symlink_to(src)
    meta_p.write_text(json.dumps(meta) + "\n")
    print(f"slice dir ready: {out_dir}")


if __name__ == "__main__":
    main()
