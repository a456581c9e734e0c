#!/bin/bash
# Interleaved A/B rounds at a fixed SF over a target-query subset:
# alternates base/new class snapshots through run_scale_bench.sh so
# host-steal bursts hit both sides equally; min-of-mins is the
# estimator (see OPTIMIZATION_r20.md "Method").
#   usage: ab_round.sh <base_classes> <new_classes> <sf_dir> <out_prefix> <rounds> <q1,q2,...>
set -e
BASE="$1"; NEW="$2"; SFDIR="$3"; PFX="$4"; ROUNDS="$5"; QS="$6"
for r in $(seq 1 "$ROUNDS"); do
  tools/run_scale_bench.sh "$BASE" "$SFDIR" "bench/r20/${PFX}_base_$r.json" "$QS"
  tools/run_scale_bench.sh "$NEW"  "$SFDIR" "bench/r20/${PFX}_new_$r.json" "$QS"
done
