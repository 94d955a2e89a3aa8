#!/bin/bash
# Round-4 TPU queue B: the split-f32 arrow (ozaki) robot20 A/B — the
# VERDICT r3 task-2 measurement — plus per-phase microbench. Strictly
# serial (single-client tunnel). Logs to /tmp/tpuq4/. Launched with
# nohup so it survives the builder session.
set -u
Q=/tmp/tpuq4
mkdir -p $Q
export PYTHONPATH=/root/repo:/root/.axon_site

probe() {
  timeout 300 python -c "
import jax, jax.numpy as jnp
x = jax.jit(lambda a: a*2+1)(jnp.ones((8,128)))
print('TPU_OK', float(x.ravel()[0]))" 2>&1 | tail -1
}

for i in $(seq 1 24); do
  out=$(probe)
  echo "$(date +%H:%M:%S) $out" >> $Q/probe.log
  case "$out" in *TPU_OK*) break;; esac
  sleep 300
done
case "$(tail -1 $Q/probe.log)" in
  *TPU_OK*) echo "TUNNEL OK $(date)" >> $Q/status.log;;
  *) echo "NEVER RECOVERED" >> $Q/status.log; exit 1;;
esac

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "=== $name start $(date)" >> $Q/status.log
  timeout "$tmo" "$@" > "$Q/$name.log" 2>&1
  echo "=== $name rc=$? $(date)" >> $Q/status.log
}

cd /root/repo
run robot20_mm1 3600 python scratch/robot20_e2e.py 1
run robot20_mm0 3600 python scratch/robot20_e2e.py 0
run robot20_phases_mm1 3000 env SCORE_TPU_EXACT_MM=1 \
    python scratch/kernel_microbench.py empty,bandfac,panel,schur robot20
run robot20_phases_mm0 3000 env SCORE_TPU_EXACT_MM=0 \
    python scratch/kernel_microbench.py empty,bandfac,panel,schur robot20
echo "QUEUE B DONE $(date)" >> $Q/status.log
