#!/bin/bash
# Round-5 endgame TPU queue (strictly serial — the tunnel is
# single-client). Safe to run detached; a lock dir prevents two copies.
#
#   stage 1 (external): populate_r5c (pid in /tmp/populate_r5c.pid)
#   stage 2: populate_r5d — new bench.py incl. the 3D single-chain
#            extra; five cached workloads load from disk (validates the
#            cache), the segmented 1x1000 graph pays its one-time
#            compile and lands in the cache. SKIPPED if stage 1 ends
#            after the cutoff: the driver's own end-of-round bench must
#            find the tunnel free, and a late ~70-min compile risks
#            holding it. The cached 6-row table always wins over the
#            7th row.
#   stage 3: validate_r5 — driver-identical `python bench.py` (default
#            2250 s budget, default probe timeouts): proves the full
#            table loads from disk inside the driver window.
set -u
cd /root/repo
LOCK=/tmp/queue_r5d.lock
if ! mkdir "$LOCK" 2>/dev/null; then
  echo "queue_r5d already running" >&2
  exit 1
fi
STAGE2_CUTOFF=$(date -u -d "11:25" +%s)

# stage 1: wait for the running populate to exit (if it is running)
if [ -f /tmp/populate_r5c.pid ]; then
  P=$(cat /tmp/populate_r5c.pid)
  while kill -0 "$P" 2>/dev/null; do sleep 15; done
fi
echo "=== populate_r5c done at $(date -u) ===" >> scratch/queue_r5d.status

# stage 2: segmented-band populate through the NEW bench.py
if [ "$(date -u +%s)" -lt "$STAGE2_CUTOFF" ]; then
  touch /tmp/tpu_busy
  SCORE_TPU_BENCH_BUDGET=7800 SCORE_TPU_PROBE_TIMEOUT=600,480,300,240 \
    python bench.py > scratch/populate_r5d.log 2>&1
  echo "=== populate_r5d rc=$? at $(date -u) ===" >> scratch/queue_r5d.status
else
  echo "=== populate_r5d SKIPPED (past cutoff) at $(date -u) ===" \
    >> scratch/queue_r5d.status
fi

# stage 3: driver-identical validation (defaults only)
touch /tmp/tpu_busy
python bench.py > scratch/validate_r5.log 2>&1
echo "=== validate_r5 rc=$? at $(date -u) ===" >> scratch/queue_r5d.status
rm -f /tmp/tpu_busy
rmdir "$LOCK"
