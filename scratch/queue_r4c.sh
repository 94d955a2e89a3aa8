#!/bin/bash
# Round-4 TPU queue C: waits for queue B (single-client tunnel), then
# measures (1) GOATS e2e after the fused solve+extract dispatch,
# (2) the 3D 4x250 plain-band bench candidate, (3) the MC batch compile
# cost today. Launched with nohup/setsid so it survives the session.
set -u
Q=/tmp/tpuq4
mkdir -p $Q
export PYTHONPATH=/root/repo:/root/.axon_site

# wait for queue B to release the tunnel (max ~4 h)
for i in $(seq 1 480); do
  grep -q "QUEUE B DONE" $Q/status.log 2>/dev/null && break
  sleep 30
done
grep -q "QUEUE B DONE" $Q/status.log 2>/dev/null || {
  echo "QUEUE C: B never finished" >> $Q/status.log; exit 1; }

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name start $(date)" >> $Q/status.log
  timeout "$tmo" "$@" > "$Q/$name.log" 2>&1
  echo "=== $name rc=$? $(date)" >> $Q/status.log
}

cd /root/repo
run goats_fused 2400 python scratch/goats_fused_probe.py
run probe3d 4200 python scratch/probe3d_bench.py
run mc_probe 4200 python scratch/mc_probe.py
echo "QUEUE C DONE $(date)" >> $Q/status.log
