#!/bin/bash
# Round-4 TPU queue F (replaces D+E, reordered): after queue C —
# 1. concurrent-compile probe (can bench overlap extras' compiles?)
# 2. robot20 current-code baseline (fori-rolled Gondzio)
# 3. robot20 blocked-arrow-off compile A/B
# 4. robot20 gondzio=0 compile A/B
set -u
Q=/tmp/tpuq4
mkdir -p $Q
export PYTHONPATH=/root/repo:/root/.axon_site

for i in $(seq 1 960); do
  grep -q "QUEUE C DONE" $Q/status.log 2>/dev/null && break
  sleep 30
done
grep -q "QUEUE C DONE" $Q/status.log 2>/dev/null || {
  echo "QUEUE F: C never finished" >> $Q/status.log; exit 1; }

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name start $(date)" >> $Q/status.log
  timeout "$tmo" "$@" > "$Q/$name.log" 2>&1
  echo "=== $name rc=$? $(date)" >> $Q/status.log
}

cd /root/repo
run concurrent_compile 2400 python scratch/concurrent_compile_probe.py
run robot20_base_r4 3600 python scratch/robot20_e2e.py 1
run robot20_noblk 3600 env SCORE_TPU_BLOCKED_ARROW=0 \
    python scratch/robot20_e2e.py 1
run robot20_g0 3600 python scratch/robot20_e2e.py 1 0
echo "QUEUE F DONE $(date)" >> $Q/status.log
