#!/bin/bash
# Round-5 directive-1 closing sequence: same-hour bench anchors
# interleaved with single-knob product-CLI legs (quiet host).
# Appends CLI rows to results/AB_PRODUCT_CLI.jsonl; bench lines to
# /tmp/ab_bench_anchors.jsonl.
set -u
cd /root/repo
log=/tmp/ab_final_r5.log
anchors=/tmp/ab_bench_anchors.jsonl
echo "=== ab_final_r5 start $(date -u +%H:%M) ===" >> "$log"

run_bench() {
  echo "--- bench anchor $(date -u +%H:%M)" >> "$log"
  timeout 1400 python bench.py >> "$anchors" 2>> "$log"
}
run_leg() {
  echo "--- CLI leg $1 $(date -u +%H:%M)" >> "$log"
  timeout 1500 python scripts/ab_product_cli.py --seq "$1" >> "$log" 2>&1
}

run_bench
run_leg device
run_leg noval
run_leg slab250
run_bench
echo "=== ab_final_r5 done $(date -u +%H:%M) ===" >> "$log"
