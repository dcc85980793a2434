#!/bin/bash
# Capture r5 serving telemetry (deadline-aware dispatch) for all three
# controllers at the shipped defaults, 5000 cycles each. Each run waits
# for a calm CPU-steal window first (the container shows steal storms in
# waves; capturing during one measures the hypervisor, not the app).
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo

wait_calm() {
  for _ in $(seq 1 120); do
    a=$(awk '/^cpu /{print $9}' /proc/stat)
    sleep 5
    b=$(awk '/^cpu /{print $9}' /proc/stat)
    if [ $((b - a)) -le 5 ]; then return 0; fi
  done
  echo "no calm window found; proceeding anyway"
}

for c in nominal snmpc rnmpc; do
  echo "=== $c: waiting for calm steal window ==="
  wait_calm
  echo "=== $c: capturing ==="
  timeout 900 python deploy_rt.py --pipeline 2 --cycles 5000 --controller "$c" \
    --telemetry "Logs/rt_telemetry_r5_${c}.bin" 2>&1 | tail -9 | tee "Logs/rt_capture_r5_${c}.log"
done
echo "ALL CAPTURES DONE"
