#!/bin/bash
# Disk-headroom monitor for scale-bench adjudication (r19): samples
# free bytes on / every 2 s into a CSV until killed, so an ENOSPC (or
# a survived run) comes with its measured scratch peak instead of a
# suspicion. Usage: disk_monitor.sh <out_csv> &  …run bench…  kill %1
OUT="${1:-/tmp/disk_monitor.csv}"
echo "epoch_s,free_bytes" > "$OUT"
while true; do
  echo "$(date +%s),$(df -B1 --output=avail / | tail -1 | tr -d ' ')" >> "$OUT"
  sleep 2
done
