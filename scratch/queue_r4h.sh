#!/bin/bash
# Round-4 TPU queue H (replaces the killed F/G tails): waits for the
# orphaned robot20 baseline child (PID in /tmp/tpuq4/r20_child.pid) to
# exit, then —
# 1. AOT serialize probe (save) — can the axon client serialize
#    compiled executables?
# 2. AOT deserialize probe (load, FRESH process) — does a saved
#    executable load + run correctly without recompiling?
# 3. robot20 per-phase microbench with production schur routing
set -u
Q=/tmp/tpuq4
mkdir -p $Q
export PYTHONPATH=/root/repo:/root/.axon_site

CHILD=$(cat $Q/r20_child.pid 2>/dev/null || echo "")
if [ -n "$CHILD" ]; then
  for i in $(seq 1 480); do
    kill -0 "$CHILD" 2>/dev/null || break
    sleep 15
  done
fi

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name start $(date)" >> $Q/status.log
  timeout "$tmo" "$@" > "$Q/$name.log" 2>&1
  echo "=== $name rc=$? $(date)" >> $Q/status.log
}

cd /root/repo
run aot_save 1800 python scratch/aot_serialize_probe.py save
run aot_load 900 python scratch/aot_serialize_probe.py load
run robot20_phases_prod 3600 python scratch/kernel_microbench.py \
    empty,assemble,bandfac,panel,schur,solve,advance robot20
echo "QUEUE H DONE $(date)" >> $Q/status.log
