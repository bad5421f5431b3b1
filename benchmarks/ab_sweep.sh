#!/bin/bash
# Sequential real-chip A/B series for the round-3 rung attribution +
# batch sweep (BASELINE.md). Each line of /tmp/ab_sweep.jsonl is one
# bench.py JSON result tagged with its argv.
cd /root/repo
out=/tmp/ab_sweep.jsonl
: > "$out"
run() {
  echo "=== bench.py $* ===" >&2
  line=$(timeout 2400 python bench.py "$@" 2>/dev/null | tail -1)
  echo "{\"args\": \"$*\", \"result\": $line}" >> "$out"
}
run --schedule stacked
run --no-fuse-params
run --schedule wavefront_pallas
run --batch 64
run --batch 128
echo DONE >> "$out"
