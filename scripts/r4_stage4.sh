#!/bin/bash
# Round-4 stage 4 (TPU, after stage 3): close the §2e mitigation claim and
# price it. One TPU process at a time.
set -u
cd "$(dirname "$0")/.."
BR=runs/bsds300_r4

echo "=== p10 probe at HIGHEST matmul precision (xla) $(date)"
timeout 3600 python scripts/quad_probe.py -data bsds300 \
  -folder "$BR/p10/bsds300" -rows -1 -b_size 100 -steps 50 \
  -backend xla -precision highest \
  > "$BR/quad_probe_p10_highest.json" 2> "$BR/quad_probe_p10_highest.log" \
  || echo "PROBE highest-xla FAILED"

echo "=== p10 probe at HIGHEST matmul precision (pallas) $(date)"
timeout 3600 python scripts/quad_probe.py -data bsds300 \
  -folder "$BR/p10/bsds300" -rows -1 -b_size 100 -steps 50 \
  -backend pallas -precision highest \
  > "$BR/quad_probe_p10_pallas_highest.json" \
  2> "$BR/quad_probe_p10_pallas_highest.log" \
  || echo "PROBE highest-pallas FAILED"

echo "=== precision cost A/B $(date)"
timeout 3600 python scripts/precision_cost_ab.py runs/precision_cost_ab.json \
  > runs/precision_cost_ab.log 2>&1 || echo "PRECISION AB FAILED"
tail -5 runs/precision_cost_ab.log

echo "=== serve-path inversion bench $(date)"
timeout 3600 python scripts/invert_bench.py runs/invert_bench.json \
  > runs/invert_bench.log 2>&1 || echo "INVERT BENCH FAILED"
tail -6 runs/invert_bench.log

echo "=== stage4 done $(date)"
