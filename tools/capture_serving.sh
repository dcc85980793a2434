#!/bin/bash
# Capture r5 serving telemetry (deadline-aware dispatch) for all three
# controllers at the shipped defaults, 5000 cycles each. Each run waits
# for a calm CPU-steal window first AND retries if a steal storm breaks
# out mid-run (the container shows hypervisor steal in waves; capturing
# during one measures the hypervisor, not the application).
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo

wait_calm() {
  for _ in $(seq 1 120); do
    a=$(awk '/^cpu /{print $9}' /proc/stat)
    sleep 5
    b=$(awk '/^cpu /{print $9}' /proc/stat)
    if [ $((b - a)) -le 4 ]; then return 0; fi
  done
  echo "no calm window found; proceeding anyway"
}

for c in "$@"; do :; done
CONTROLLERS=${*:-"nominal snmpc rnmpc"}

for c in $CONTROLLERS; do
  for attempt in 1 2 3 4; do
    echo "=== $c (attempt $attempt): waiting for calm steal window ==="
    wait_calm
    echo "=== $c: capturing ==="
    timeout 900 python deploy_rt.py --pipeline 2 --cycles 5000 --controller "$c" \
      --telemetry "Logs/rt_telemetry_r5_${c}.bin" 2>&1 | tail -9 > "/tmp/cap_${c}.log"
    steal=$(grep -oE "steal during run: [0-9.]+" "/tmp/cap_${c}.log" | grep -oE "[0-9.]+")
    echo "steal during run: ${steal:-?} s"
    if python3 -c "import sys; sys.exit(0 if float('${steal:-99}') < 2.5 else 1)"; then
      cp "/tmp/cap_${c}.log" "Logs/rt_capture_r5_${c}.log"
      cat "Logs/rt_capture_r5_${c}.log"
      break
    fi
    echo "steal storm mid-run — retrying"
  done
done
echo "ALL CAPTURES DONE"
