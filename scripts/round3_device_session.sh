#!/bin/bash
# One-command capture of the round-3 device-gated queue (run when the
# axon tunnel is up; see CLAUDE.md "Workflow" + the memory note
# round3-pending-device-tasks). Steps run STRICTLY in order, one TPU
# process at a time, each logged under /tmp/r3dev/:
#
#   0. tunnel probe (timeout 150 s) — abort early instead of hanging
#   1. make device-check              — hard gate; nonzero exit stops all
#   2. stratified adaptive floor      — chunk-mean t-CI walls (caps 16,24)
#   3. BENCH_CONVERGENCE=golden bench — headline + full-frame golden gate
#   4. BENCH_CONFIG=all bench         — the full BASELINE matrix
#
# Usage:  bash scripts/round3_device_session.sh
# Skip the long matrix with R3_SKIP_MATRIX=1.

set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r3dev
mkdir -p "$LOG"

echo "== step 0: tunnel probe =="
if ! timeout 150 python -c "import jax; d=jax.devices(); assert d; print(d)" \
    > "$LOG/probe.log" 2>&1; then
  echo "TUNNEL DOWN (probe hung/failed) — aborting; see $LOG/probe.log"
  exit 2
fi
cat "$LOG/probe.log"

echo "== step 1: make device-check =="
if ! timeout 3600 make device-check > "$LOG/device_check.log" 2>&1; then
  echo "DEVICE-CHECK FAILED — do NOT capture BENCH; see $LOG/device_check.log"
  tail -30 "$LOG/device_check.log"
  exit 1
fi
tail -5 "$LOG/device_check.log"

echo "== step 2: stratified adaptive floor (chunk-mean CI walls) =="
if ! ADAPTIVE_SAMPLER=stratified ADAPTIVE_CAPS=16,24 timeout 3600 \
    python scripts/measure_adaptive_floor.py > "$LOG/adaptive_floor.log" 2>&1; then
  echo "adaptive floor run failed (non-fatal); see $LOG/adaptive_floor.log"
  tail -20 "$LOG/adaptive_floor.log"
else
  cat "$LOG/adaptive_floor.log"
fi

echo "== step 3: golden-gated bench (headline) =="
if ! BENCH_CONVERGENCE=golden timeout 7200 python bench.py \
    > "$LOG/bench_golden.log" 2>&1; then
  echo "GOLDEN BENCH FAILED; see $LOG/bench_golden.log"
  tail -30 "$LOG/bench_golden.log"
  exit 1
fi
tail -5 "$LOG/bench_golden.log"

if [ "${R3_SKIP_MATRIX:-0}" != "1" ]; then
  echo "== step 4: full BASELINE matrix =="
  if ! BENCH_CONFIG=all timeout 7200 python bench.py \
      > "$LOG/bench_all.log" 2>&1; then
    echo "matrix bench failed (headline already captured); see $LOG/bench_all.log"
    tail -20 "$LOG/bench_all.log"
  else
    tail -10 "$LOG/bench_all.log"
  fi
fi

if [ "${R3_GALLERY:-0}" = "1" ]; then
  echo "== step 5 (opt): refresh gallery (cover + adaptive heatmap) =="
  if ! timeout 3600 python scripts/render_gallery.py cover \
      > "$LOG/gallery.log" 2>&1 \
      || ! timeout 3600 python scripts/render_gallery.py adaptive \
      >> "$LOG/gallery.log" 2>&1; then
    echo "gallery refresh failed (non-fatal); see $LOG/gallery.log"
  else
    tail -4 "$LOG/gallery.log"
  fi
fi

echo "== done; logs in $LOG =="
