#!/bin/bash
# Fire the queued on-chip A/Bs + the benchmark of record, ONE AT A TIME
# (the chip serializes across processes), each bounded and logged.
# Run from the repo root once `timeout 300 python -c "import jax;
# print(jax.devices()[0])"` succeeds (the axon service can be down for
# hours — see NOTES_ROUND4 rig status).
#
#   bash probes/fire_queue.sh [logdir]
#
# Order matters: the measured headline-slice decomposition first (it
# drives what to optimize next), then the transfer and fmg A/Bs (round-5
# queue items 2-3), then bench.py for the round record. All numbers are
# same-session comparable; never compare against another day's run
# (±10% rig variance).
set -u
cd "$(dirname "$0")/.."
LOG="${1:-/tmp/fire_queue_$(date +%H%M%S)}"
mkdir -p "$LOG"
echo "logs -> $LOG"

run() {
  name=$1; shift
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout 3000 "$@" >"$LOG/$name.log" 2>&1
  rc=$?
  tail -25 "$LOG/$name.log"
  echo "=== $name exit=$rc ==="
}

run preflight  python -c "import jax; print(jax.devices()[0])"
run headline_slices python probes/headline_slices.py
run transfer_ab     python probes/transfer_ab.py
run fmg_ab          python probes/fmg_ab.py
run bench           python bench.py
