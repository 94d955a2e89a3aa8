#!/bin/bash
# Round-4 TPU queue J: FINAL bench populate + driver-identical validation.
#
# 1. waits for queue I to finish (its pid dies or status marker appears)
# 2. waits for /tmp/tpuq4/GO_J (builder finalizes bench.py first) — or
#    proceeds after 90 min anyway (failsafe if the builder session dies)
# 3. tunnel probe loop (pool can wedge for hours; retry every 5 min)
# 4. seeds the DEFAULT aot cache (~/.cache/score_tpu/aot) from queue I's
#    scratch cache (keys embed the source digest: stale entries are
#    simply never matched, so the copy is harmless)
# 5. bench_populate: threaded warm, huge budget — pays each workload's
#    remote compile ONCE, saving serialized executables to the default
#    cache dir
# 6. bench_validate: EXACTLY as the driver runs it (default env) — the
#    fresh process should load every executable from disk and emit all
#    six rows in minutes with rc=0
set -u
Q=/tmp/tpuq4
mkdir -p $Q
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

# --- 1. wait for queue I ---
for i in $(seq 1 48); do
  ipid=$(cat $Q/queue_i.pid 2>/dev/null || echo 0)
  if ! kill -0 "$ipid" 2>/dev/null; then break; fi
  if grep -q "QUEUE I DONE\|QUEUE I: TUNNEL DOWN" $Q/status.log 2>/dev/null; then break; fi
  sleep 300
done

# --- 2. wait for the builder's go signal (max 90 min) ---
for i in $(seq 1 18); do
  [ -f $Q/GO_J ] && break
  sleep 300
done

probe() {
  timeout 300 python -c "
import jax, jax.numpy as jnp
x = jax.jit(lambda a: a*2+1)(jnp.ones((8,128)))
print('TPU_OK', float(x.ravel()[0]))" 2>&1 | tail -1
}

# --- 3. tunnel probe loop (up to 2 h) ---
ok=""
for i in $(seq 1 24); do
  out=$(probe)
  echo "$(date +%H:%M:%S) J $out" >> $Q/probe.log
  case "$out" in *TPU_OK*) ok=1; break;; esac
  sleep 300
done
if [ -z "$ok" ]; then
  echo "QUEUE J: TUNNEL DOWN $(date)" >> $Q/status.log
  exit 1
fi

# --- 4. seed the default cache from queue I's scratch cache ---
DEF=~/.cache/score_tpu/aot
mkdir -p "$DEF"
cp -n $Q/aot_e2e_cache/*.pkl "$DEF/" 2>/dev/null || true

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name start $(date)" >> $Q/status.log
  timeout "$tmo" "$@" > "$Q/$name.log" 2>&1
  echo "=== $name rc=$? $(date)" >> $Q/status.log
}

# --- 5. populate (threaded warm; budget sized to the timeout) ---
run bench_populate 7200 env SCORE_TPU_BENCH_THREADS=1 \
    SCORE_TPU_BENCH_BUDGET=6600 python bench.py

# --- 6. validate exactly as the driver runs it ---
run bench_validate 2700 python bench.py
echo "QUEUE J DONE $(date)" >> $Q/status.log
