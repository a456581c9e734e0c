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

Usage: make_slice.py <sfDir> <outDir> [mod] [table] [baseDir]

`table` (default `documents`, key `doc_id`; or `embeddings`, key
`vec_id`) picks which table is sliced; every other table is
symlinked unchanged.

If `baseDir` is given (the ScaleGen SOURCE dir, e.g.
/root/testdata/sf0.1), the slice keeps whole REPLICA GROUPS instead
of individual ids: rows with `(key // stride) % mod = 0` where
`stride = max(base key) + 1` — ScaleGen's replica shift. An id-modulo
slice thins cross-document duplicate PAIRS ~mod² (both endpoints must
survive), so dup-path columns verify as zeros; a replica slice keeps
every within-replica pair intact (ScaleGen makes cross-replica
shingle sets disjoint, so ALL dup pairs are within-replica), at the
cost of a coarser volume knob (corpus shrinks ~mod×, self-join state
~mod²× like the id slice).

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
    base_dir = Path(sys.argv[5]).resolve() if len(sys.argv) > 5 else None
    key = KEYS[sliced]
    out_dir.mkdir(parents=True, exist_ok=True)
    if base_dir is not None:
        glob_b = (f"{base_dir / (sliced + '.parquet')}/*.parquet"
                  if (base_dir / f"{sliced}.parquet").is_dir()
                  else str(base_dir / f"{sliced}.parquet"))
        stride = duckdb.connect().execute(
            f"SELECT max({key}) + 1 FROM '{glob_b}'").fetchone()[0]
        pred = f"({key} // {stride}) % {mod} = 0"
    else:
        stride = None
        pred = f"{key} % {mod} = 0"
    # a slice is only reusable if it was built from the same source
    # with the same predicate AND finished -- otherwise a rerun with a
    # different mod, or one over a crashed prior run's partial output
    # (or foreign files), would silently verify against a stale corpus
    meta_p = out_dir / "slice_meta.json"
    meta = {"src": str(sf_dir), "mod": mod, "table": sliced,
            "stride": stride, "complete": True}
    stale = None
    if meta_p.exists():
        prior = json.loads(meta_p.read_text())
        # pre-upgrade metas lack the stride/complete keys; a finished
        # id-modulo slice from the old tool is byte-identical to what
        # this tool would rebuild, so treat the missing keys as their
        # old-tool values instead of forcing a spurious rebuild
        prior.setdefault("stride", None)
        prior.setdefault("complete", True)
        if {**prior, "complete": True} != meta:
            sys.exit(f"{out_dir} holds a different slice "
                     f"({meta_p.read_text().strip()}); delete it or pick "
                     f"another outDir")
        if prior["complete"]:
            # identical and finished: re-stamping complete=false first
            # would open a window where a crash (or a concurrent reader)
            # sees a valid slice marked incomplete and rebuilds it.
            # Short-circuit only when no table is missing — a slice
            # built before a table joined TABLES (or whose symlink was
            # deleted) falls through to the backfill loop, which skips
            # the existing outputs and creates only the gaps. A table
            # counts as present only if Path.exists() is true — it
            # follows symlinks, so a DANGLING symlink (target parquet
            # deleted or moved) is missing, not present (r18 advice:
            # is_symlink() alone accepted dangling links and reused a
            # slice whose source had vanished).
            missing = [t for t in TABLES
                       if (sf_dir / f"{t}.parquet").exists()
                       and not (out_dir / f"{t}.parquet").exists()]
            if not missing:
                print(f"slice dir already complete: {out_dir}")
                return
        stale = not prior.get("complete", False)
    else:
        existing = [t for t in TABLES
                    if (out_dir / f"{t}.parquet").exists()
                    or (out_dir / f"{t}.parquet").is_symlink()]
        if existing:
            sys.exit(f"{out_dir} holds files with no slice_meta.json "
                     f"({existing}); refusing to adopt them — delete the "
                     f"dir or pick another outDir")
    if stale:
        # crashed prior run: its per-table outputs are untrustworthy
        for t in TABLES:
            dst = out_dir / f"{t}.parquet"
            if dst.is_symlink():
                dst.unlink()
            elif dst.exists():
                dst.unlink()
    # stamp the attempt BEFORE slicing so a crash leaves complete=false
    meta_p.write_text(json.dumps({**meta, "complete": False}) + "\n")
    for t in TABLES:
        src = sf_dir / f"{t}.parquet"
        if not src.exists():
            continue
        dst = out_dir / f"{t}.parquet"
        if dst.is_symlink() and not dst.exists():
            # dangling link (see the missing-table check above): remove
            # so the rebuild below can land at this path
            dst.unlink()
        if dst.exists():
            continue
        if t == sliced:
            glob = f"{src}/*.parquet" if src.is_dir() else str(src)
            con = duckdb.connect()
            con.execute(
                f"COPY (SELECT * FROM '{glob}' WHERE {pred}) "
                f"TO '{dst}' (FORMAT PARQUET)")
            n = con.execute(f"SELECT count(*) FROM '{dst}'").fetchone()[0]
            print(f"{sliced} slice: {n} rows (WHERE {pred})")
        else:
            dst.symlink_to(src)
    meta_p.write_text(json.dumps(meta) + "\n")
    print(f"slice dir ready: {out_dir}")


if __name__ == "__main__":
    main()
