#!/bin/bash
# Poll TPU health every 5 min until HEALTHY (max ~3h). Exits 0 on healthy.
cd "$(dirname "$0")/.."
LOG=experiments/data/health_watch.log
for i in $(seq 1 36); do
  echo "--- probe $i $(date -u +%H:%M:%S) ---" >> "$LOG"
  PALLAS_AXON_POOL_IPS= python scripts/tpu_health.py 120 >> "$LOG" 2>&1
  rc=$?
  if [ $rc -eq 0 ]; then echo "HEALTHY at probe $i" >> "$LOG"; exit 0; fi
  sleep 300
done
echo "still unhealthy after 36 probes" >> "$LOG"
exit 1
