#!/bin/bash
# Round-4 TPU queue K: targeted AOT-cache mop-up. The populate pass's
# serial joins let the 3D and MC compiles die with the process; the
# validate pass re-pays 3D inline. This queue compiles ONLY the still-
# missing Monte-Carlo batch executable (bench._McBatchExtra().warm()
# saves it via parallel/batch._batch_dispatch) so the driver's bench
# run loads everything from disk.
#
# Hard gates to stay clear of the driver's own end-of-round bench run:
# only STARTS work before START_DEADLINE, and the warm is timeout-capped
# so the tunnel is free again well before the round closes.
set -u
Q=/tmp/tpuq4
START_DEADLINE="12:00"
WARM_TIMEOUT=1500

# wait for queue J (validate) to finish
for i in $(seq 1 24); do
  jpid=$(cat $Q/queue_j.pid 2>/dev/null || echo 0)
  kill -0 "$jpid" 2>/dev/null || break
  grep -q "QUEUE J DONE\|QUEUE J: TUNNEL DOWN" $Q/status.log 2>/dev/null && break
  sleep 120
done

now=$(date +%H:%M)
if [[ "$now" > "$START_DEADLINE" ]]; then
  echo "QUEUE K: past start deadline ($now) — skipping" >> $Q/status.log
  exit 0
fi

cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

echo "=== mc_mopup start $(date)" >> $Q/status.log
timeout $WARM_TIMEOUT python -c "
import time, json
t0 = time.perf_counter()
import bench
e = bench._McBatchExtra()
e.warm()
print(json.dumps({'step': 'mc_warm', 's': round(time.perf_counter()-t0, 1)}),
      flush=True)
e.run()
" > $Q/mc_mopup.log 2>&1
echo "=== mc_mopup rc=$? $(date)" >> $Q/status.log
echo "QUEUE K DONE $(date)" >> $Q/status.log
