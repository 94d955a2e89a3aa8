#!/bin/bash
# Round-4 TPU queue D: compile-cost attribution on the 20-robot world.
# The robot20 graph compiles in ~24 min (vs GOATS ~5) — these A/Bs
# isolate the blocked-arrow scan, the ozaki matmuls, and the unrolled
# Gondzio correctors as compile-time drivers. Waits for queue C.
set -u
Q=/tmp/tpuq4
mkdir -p $Q
export PYTHONPATH=/root/repo:/root/.axon_site

for i in $(seq 1 720); do
  grep -q "QUEUE C DONE" $Q/status.log 2>/dev/null && break
  sleep 30
done
grep -q "QUEUE C DONE" $Q/status.log 2>/dev/null || {
  echo "QUEUE D: C never finished" >> $Q/status.log; exit 1; }

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name start $(date)" >> $Q/status.log
  timeout "$tmo" "$@" > "$Q/$name.log" 2>&1
  echo "=== $name rc=$? $(date)" >> $Q/status.log
}

cd /root/repo
run robot20_noblk 3600 env SCORE_TPU_BLOCKED_ARROW=0 \
    python scratch/robot20_e2e.py 1
run robot20_g0 3600 python scratch/robot20_e2e.py 1 0
echo "QUEUE D DONE $(date)" >> $Q/status.log
