#!/bin/bash
# Round-3 on-chip measurement session (VERDICT r2 items 1-3).
#
# Runs everything sequentially (solo runs; CLAUDE.md A/B rule: never two
# device processes at once). Each step is independently timeout-guarded so
# a hang cannot eat the whole session; results accumulate in $LOG and the
# JSON lines land in benchmarks/results.json via the tools themselves.
#
# Usage: bash tools/onchip_session.sh [logfile]
cd /root/repo || exit 1
LOG=${1:-/tmp/tpu_session_r3.log}
exec >> "$LOG" 2>&1
echo "=== on-chip session start $(date) ==="

run() {
  echo "--- $* --- $(date +%H:%M:%S)"
  timeout "${STEP_TIMEOUT:-5400}" env PYTHONPATH=/root/repo:$PYTHONPATH "$@"
  echo "--- exit $? $(date +%H:%M:%S)"
}

# 1. early signal: quick bench (16M) — validates the chip + HEAD kernel
run python bench.py --quick
# 2. headline bench (268M) with full native-oracle verify -> BENCH_r03 data
run python bench.py
# 3. A/B matrix for the round-2 kernel/plan changes (VERDICT item 1):
#    g5 vs g8 cross fusion, substage cap, tile size, window packing
run python tools/ab_matrix.py --exp 28 --reps 5
# 4. KV64 + all pairs/keys rows at 1M/16M/256M (VERDICT item 2)
run python benchmarks/full.py --sizes 1M,16M,256M
# 5. per-sweep GB/s profile (MSB-partition decision basis, VERDICT item 3)
run python tools/profile_sweeps.py --L 28
# 6. per-element gather floor + ragged bucketed-DMA scatter floor
run python tools/gather_floor.py
run python tools/partition_dma_floor.py
run python tools/partition_dma_floor.py --r 256 --w 16
# 7. on-chip correctness drive (42+ oracle checks)
run python tools/drive_tpu.py
echo "=== on-chip session done $(date) ==="
