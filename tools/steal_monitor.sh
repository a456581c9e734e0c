#!/bin/bash
# Continuous CPU-steal sampler: prints one line per interval with the
# steal fraction over that interval (fields: epoch-sec steal_frac).
# Companion to Bench's start-of-run stamp — a whole-run trace, for
# adjudicating which timed passes a steal burst contaminated.
#   usage: steal_monitor.sh [interval_sec] > trace.txt
INT="${1:-2}"
read -r -a prev < <(head -1 /proc/stat | tr -s ' ' | cut -d' ' -f2-9)
while sleep "$INT"; do
  read -r -a cur < <(head -1 /proc/stat | tr -s ' ' | cut -d' ' -f2-9)
  tot=0; for i in "${!cur[@]}"; do tot=$((tot + cur[i] - prev[i])); done
  st=$((cur[7] - prev[7]))
  if [ "$tot" -gt 0 ]; then
    printf '%s %s\n' "$(date +%s)" "$(awk "BEGIN{printf \"%.4f\", $st/$tot}")"
  fi
  prev=("${cur[@]}")
done
