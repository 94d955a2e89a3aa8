#!/bin/bash
# TPU measurement queue: waits for the axon pool to recover, then runs
# the round-3 CR measurement sequence STRICTLY SERIALLY (the tunnel is
# single-client; concurrent clients starve each other and can wedge the
# grant). Each step logs to /tmp/tpuq/<name>.log.
set -u
mkdir -p /tmp/tpuq
Q=/tmp/tpuq
export PYTHONPATH=/root/repo:/root/.axon_site

probe() {
  timeout 300 python -c "
import jax, jax.numpy as jnp
x = jax.jit(lambda a: a*2+1)(jnp.ones((8,128)))
print('TPU_OK', float(x.ravel()[0]))" 2>&1 | tail -1
}

# --- wait for recovery (up to ~8h, 10-min cadence) -------------------
for i in $(seq 1 48); do
  out=$(probe)
  echo "$(date +%H:%M:%S) $out" >> $Q/probe.log
  case "$out" in *TPU_OK*) break;; esac
  sleep 600
done
case "$(tail -1 $Q/probe.log)" in
  *TPU_OK*) echo "RECOVERED $(date)" >> $Q/probe.log;;
  *) echo "NEVER RECOVERED" >> $Q/probe.log; exit 1;;
esac

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "=== $name start $(date)" >> $Q/status.log
  timeout "$tmo" "$@" > "$Q/$name.log" 2>&1
  echo "=== $name rc=$? $(date)" >> $Q/status.log
}

cd /root/repo
# 1. GOATS phases, CR on (default)
run goats_cr_on 2400 python scratch/kernel_microbench.py \
    empty,bandfac,band,solve,advance goats
# 2. GOATS phases, CR off
run goats_cr_off 2400 env SCORE_TPU_CR_MIN_LANES=999999999 \
    python scratch/kernel_microbench.py empty,bandfac,band,solve,advance goats
# 3. end-to-end GOATS bench (primary metric)
run bench_quick 2400 env SCORE_TPU_BENCH_QUICK=1 python bench.py
# 4. MC batch probe (mixed, 20 iters) — CR-on vmapped band
run mc_mixed 5400 python scratch/mc_batch_probe.py mixed 20
# 5. robot20 phase split (panel/schur fat hunt)
run robot20_phases 3600 python scratch/kernel_microbench.py \
    empty,bandfac,panel,schur,advance robot20
echo "QUEUE DONE $(date)" >> $Q/status.log
