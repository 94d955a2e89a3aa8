#!/bin/bash
# Round-4 TPU queue E: (1) concurrent-compile probe — decides whether
# bench.py can overlap the extras' compiles from threads; (2) robot20
# with the CURRENT code (fori-rolled Gondzio) as the clean baseline for
# queue D's noblk/g0 attribution A/Bs. Waits for queue D.
set -u
Q=/tmp/tpuq4
mkdir -p $Q
export PYTHONPATH=/root/repo:/root/.axon_site

for i in $(seq 1 960); do
  grep -q "QUEUE D DONE" $Q/status.log 2>/dev/null && break
  sleep 30
done
grep -q "QUEUE D DONE" $Q/status.log 2>/dev/null || {
  echo "QUEUE E: D never finished" >> $Q/status.log; exit 1; }

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name start $(date)" >> $Q/status.log
  timeout "$tmo" "$@" > "$Q/$name.log" 2>&1
  echo "=== $name rc=$? $(date)" >> $Q/status.log
}

cd /root/repo
run concurrent_compile 2400 python scratch/concurrent_compile_probe.py
run robot20_base_r4 3600 python scratch/robot20_e2e.py 1
echo "QUEUE E DONE $(date)" >> $Q/status.log
