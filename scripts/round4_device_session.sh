#!/bin/bash
# Round-4 device session: the round-3 capture queue (VERDICT r3 #1)
# plus the round-4 scan experiments, strictly ordered, one TPU process
# at a time, logs under /tmp/r4dev/:
#
#   0. tunnel probe (timeout 150 s)     — abort instead of hanging
#   1. make device-check                — hard gate; nonzero stops all
#   2. gathered cluster scan A/B        — scripts/bench_cluster.py
#   2b. MXU scan A/B (if 2 rejected)    — scripts/bench_scan_mxu.py
#   3. Mosaic per-lane gather timings   — scripts/probe_mosaic_gather.py
#   4. stratified adaptive floor        — chunk-mean t-CI walls
#   5. BENCH_CONVERGENCE=golden bench   — headline + golden gates
#      (BENCH_CLUSTER=1 / BENCH_SCAN_MXU=1 per the ADOPT verdicts)
#   6. BENCH_CONFIG=all bench           — full BASELINE matrix
#   7. gallery refresh (R4_GALLERY=1)   — cover + adaptive heatmap
#
# Usage: bash scripts/round4_device_session.sh
# R4_SKIP_MATRIX=1 skips step 6; R4_GALLERY=1 adds step 7.

set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r4dev
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

echo "== step 2: gathered cluster scan A/B (cpi sweep) =="
SCAN_ENV=""
if timeout 7200 python scripts/bench_cluster.py > "$LOG/cluster.log" 2>&1; then
  cat "$LOG/cluster.log"
  ADOPT_LINE=$(grep "VERDICT=ADOPT" "$LOG/cluster.log" || true)
  if [ -n "$ADOPT_LINE" ]; then
    CPI=$(echo "$ADOPT_LINE" | sed -n 's/.*cpi=\([0-9]*\).*/\1/p')
    BNDS=$(echo "$ADOPT_LINE" | sed -n 's/.*bounds=\([a-z]*\).*/\1/p')
    SCAN_ENV="BENCH_CLUSTER=1 BENCH_CLUSTER_CPI=${CPI:-2} BENCH_CLUSTER_BOUNDS=${BNDS:-sphere}"
    echo "cluster scan ADOPTED (bounds=${BNDS:-sphere} cpi=${CPI:-2}) for the headline bench"
  fi
else
  echo "cluster A/B failed (non-fatal); see $LOG/cluster.log"
  tail -20 "$LOG/cluster.log"
fi

echo "== step 2b: MXU scan A/B (only if cluster not adopted) =="
if [ -z "$SCAN_ENV" ]; then
  if timeout 3600 python scripts/bench_scan_mxu.py > "$LOG/scan_mxu.log" 2>&1; then
    cat "$LOG/scan_mxu.log"
    if grep -q "VERDICT=ADOPT" "$LOG/scan_mxu.log"; then
      SCAN_ENV="BENCH_SCAN_MXU=1"
      echo "MXU scan ADOPTED for the headline bench"
    fi
  else
    echo "MXU A/B failed (non-fatal for the capture queue); see $LOG/scan_mxu.log"
    tail -20 "$LOG/scan_mxu.log"
  fi
else
  echo "skipped (cluster scan already adopted)"
fi

echo "== step 3: Mosaic per-lane gather timings =="
if ! timeout 3600 python scripts/probe_mosaic_gather.py \
    > "$LOG/gather_probe.log" 2>&1; then
  echo "gather probe failed (non-fatal); see $LOG/gather_probe.log"
fi
tail -8 "$LOG/gather_probe.log" || true

echo "== step 4: stratified adaptive floor (chunk-mean CI walls) =="
if ! ADAPTIVE_SAMPLER=stratified ADAPTIVE_CAPS=16,24 timeout 3600 \
    python scripts/measure_adaptive_floor.py > "$LOG/adaptive_floor.log" 2>&1; then
  echo "adaptive floor run failed (non-fatal); see $LOG/adaptive_floor.log"
  tail -20 "$LOG/adaptive_floor.log"
else
  cat "$LOG/adaptive_floor.log"
fi

echo "== step 5: golden-gated bench (headline) =="
if ! env $SCAN_ENV BENCH_CONVERGENCE=golden timeout 7200 python bench.py \
    > "$LOG/bench_golden.log" 2>&1; then
  echo "GOLDEN BENCH FAILED; see $LOG/bench_golden.log"
  tail -30 "$LOG/bench_golden.log"
  exit 1
fi
tail -5 "$LOG/bench_golden.log"

if [ "${R4_SKIP_MATRIX:-0}" != "1" ]; then
  echo "== step 6: full BASELINE matrix =="
  if ! env $SCAN_ENV BENCH_CONFIG=all timeout 7200 python bench.py \
      > "$LOG/bench_all.log" 2>&1; then
    echo "matrix bench failed (headline already captured); see $LOG/bench_all.log"
    tail -20 "$LOG/bench_all.log"
  else
    tail -10 "$LOG/bench_all.log"
  fi
fi

if [ "${R4_GALLERY:-0}" = "1" ]; then
  echo "== step 7 (opt): refresh gallery (cover + adaptive heatmap) =="
  if ! timeout 3600 python scripts/render_gallery.py cover \
      > "$LOG/gallery.log" 2>&1 \
      || ! timeout 3600 python scripts/render_gallery.py adaptive \
      >> "$LOG/gallery.log" 2>&1; then
    echo "gallery refresh failed (non-fatal); see $LOG/gallery.log"
  else
    tail -4 "$LOG/gallery.log"
  fi
fi

if [ "${R4_SKIP_ABLATIONS:-0}" != "1" ]; then
  echo "== step 8: opportunistic ledger ablations (VERDICT r3 #5) =="
  # fused-unsorted re-measure (sorted vs unsorted, bitwise gate)
  if timeout 3600 python scripts/bench_unsorted.py 500 \
      > "$LOG/unsorted.log" 2>&1; then
    tail -3 "$LOG/unsorted.log"
  else
    echo "unsorted A/B failed (non-fatal); see $LOG/unsorted.log"
    tail -5 "$LOG/unsorted.log"
  fi
  # K=8 virtual tiles at a reduced spp (VMEM bounds the chunk; a
  # compile/VMEM failure is itself the recorded result)
  if timeout 3600 python scripts/bench_kslots.py 8 200 5 \
      > "$LOG/kslots8.log" 2>&1; then
    tail -3 "$LOG/kslots8.log"
  else
    echo "K=8 run failed (recorded; see $LOG/kslots8.log)"
    tail -5 "$LOG/kslots8.log"
  fi
fi

echo "== done; logs in $LOG =="
