#!/bin/bash
# Round-4 TPU queue G: after queue F —
# 1. full bench.py dress rehearsal with threaded concurrent warm
#    (validates the BENCH_r04 artifact path end-to-end: rc must be 0
#    and every row that fits the 2250 s budget must be emitted)
# 2. robot20 per-phase microbench with the production schur routing
#    (exact_mm + blocked arrow) to split the remaining ~100 ms/iter
set -u
Q=/tmp/tpuq4
mkdir -p $Q
export PYTHONPATH=/root/repo:/root/.axon_site

for i in $(seq 1 960); do
  grep -q "QUEUE F DONE\|QUEUE F: C never finished" $Q/status.log 2>/dev/null && break
  sleep 30
done
grep -q "QUEUE F DONE" $Q/status.log 2>/dev/null || {
  echo "QUEUE G: F never finished" >> $Q/status.log; exit 1; }

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name start $(date)" >> $Q/status.log
  timeout "$tmo" "$@" > "$Q/$name.log" 2>&1
  echo "=== $name rc=$? $(date)" >> $Q/status.log
}

cd /root/repo
run bench_rehearsal 2700 env SCORE_TPU_BENCH_THREADS=1 python bench.py
run robot20_phases_prod 3600 python scratch/kernel_microbench.py \
    empty,assemble,bandfac,panel,schur,solve,advance robot20
echo "QUEUE G DONE $(date)" >> $Q/status.log
