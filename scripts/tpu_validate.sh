#!/bin/bash
# Post-recovery TPU validation queue (run after scripts/tpu_health.py says
# HEALTHY). Runs serially — ONE TPU process at a time (CLAUDE.md). Each
# stage logs to experiments/data/validate_*.log; safe to re-run.
set -u
cd "$(dirname "$0")/.."
mkdir -p experiments/data

echo "== health =="
PALLAS_AXON_POOL_IPS= python -u scripts/tpu_health.py 120 || exit 1

echo "== headline bench (3 runs) =="
for i in 1 2 3; do
  python -u bench.py 2>experiments/data/validate_bench$i.err \
    | tee experiments/data/validate_bench$i.log
done

echo "== 10M tier (init should now be ~170s with the fast builder) =="
python -u experiments/probe_10m.py 2>&1 \
  | tee experiments/data/validate_10m.log

echo "== done — update BASELINE.md / README.md with the new numbers =="
