#!/bin/bash
# Sequential bench.py A/B sweep on the real TPU chip — ONE knob changes
# per run (CLAUDE.md perf rule: kernel-microbench wins do not compose;
# bench noise is ±0.4% and a run is ~10 min incl. compile).
#
# Usage:  bash scripts/ab_sweep.sh [outfile]
# Writes one labeled JSON line per configuration; stops early if the
# baseline run fails (tunnel down).
set -u
OUT="${1:-/tmp/ab_results.txt}"
cd "$(dirname "$0")/.."

run() {
  local label="$1"; shift
  echo "== $label ($(date -u +%H:%M:%S)) ==" | tee -a "$OUT"
  # env assignments arrive as KEY=VAL args
  if env "$@" timeout 2400 python bench.py > /tmp/ab_one.json 2>/tmp/ab_one.err; then
    echo "$label $(tail -1 /tmp/ab_one.json)" | tee -a "$OUT"
  else
    echo "$label FAILED: $(tail -2 /tmp/ab_one.err | head -1)" | tee -a "$OUT"
    return 1
  fi
}

: > "$OUT"
run baseline                  || exit 1   # re-confirm the 166.0k state
run s2d_heads   CRNERF_BENCH_S2D=1
run pdf_maskreduce CRNERF_BENCH_PDF=maskreduce
run chunk_unroll  CRNERF_BENCH_UNROLL=1
run fwd_arbitrary CRNERF_FWD_ARBITRARY=1  # parallel fwd semantics are
# the default since the 2026-08-19 sweep (+0.9%); this A/Bs the old mode
# G=32 re-measure: pre-fused-kernel HBM blocked it; stash+chunking now
# bound peak memory per chunk, and a bigger G amortizes the ~8-10 ms
# flat tail (speed-of-light table, BASELINE.md)
run g32           CRNERF_BENCH_G=32
run s2d_stack     CRNERF_BENCH_S2D_STACK=1  # whole-stack packed encoder
run fwd_tile_2048 CRNERF_FWD_TILE_PTS=2048  # tile A/Bs (2026-08-19 sweep:
run bwd_tile_1024 CRNERF_BWD_TILE_PTS=1024  # 4096-pt bwd -5%; 1024-pt and
run bwd_tile_4096 CRNERF_BWD_TILE_PTS=4096  # G=24 within day noise)
run g24           CRNERF_BENCH_G=24
echo "sweep done $(date -u)" | tee -a "$OUT"
