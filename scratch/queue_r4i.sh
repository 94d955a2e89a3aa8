#!/bin/bash
# Round-4 TPU queue I: end-to-end AOT executable-cache validation on the
# production GOATS graph. Strictly serial (single-client tunnel).
# 1. goats_aot_cold  — cold cache: pays the remote compile, SAVES
#    executables to a scratch cache dir
# 2. goats_aot_warm  — FRESH process, same cache dir: first call should
#    load in seconds instead of recompiling
set -u
Q=/tmp/tpuq4
mkdir -p $Q
# Frozen snapshot: the aotcache key includes a content digest of the
# package sources, so the cold and warm probes must see IDENTICAL code
# even while development continues in /root/repo.
SNAP=/tmp/q4i_snap
rm -rf "$SNAP"
mkdir -p "$SNAP"
cp -r /root/repo/score_tpu /root/repo/scratch "$SNAP/"
export PYTHONPATH=$SNAP:/root/.axon_site
CACHE=$Q/aot_e2e_cache
rm -rf "$CACHE"

probe() {
  timeout 300 python -c "
import jax, jax.numpy as jnp
x = jax.jit(lambda a: a*2+1)(jnp.ones((8,128)))
print('TPU_OK', float(x.ravel()[0]))" 2>&1 | tail -1
}

for i in $(seq 1 24); do
  out=$(probe)
  echo "$(date +%H:%M:%S) I $out" >> $Q/probe.log
  case "$out" in *TPU_OK*) break;; esac
  sleep 300
done
case "$(tail -1 $Q/probe.log)" in
  *TPU_OK*) ;;
  *) echo "QUEUE I: TUNNEL DOWN $(date)" >> $Q/status.log; exit 1;;
esac

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name start $(date)" >> $Q/status.log
  timeout "$tmo" "$@" > "$Q/$name.log" 2>&1
  echo "=== $name rc=$? $(date)" >> $Q/status.log
}

cd "$SNAP"
run goats_aot_cold 2400 python scratch/aot_e2e_probe.py "$CACHE"
run goats_aot_warm 1200 python scratch/aot_e2e_probe.py "$CACHE"
echo "QUEUE I DONE $(date)" >> $Q/status.log
