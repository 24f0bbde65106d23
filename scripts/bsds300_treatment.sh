#!/bin/bash
# bsds300 residual decomposition (round-4 VERDICT item 5): give bsds300 the
# miniboone treatment — (a) the -s_patience 10 schedule control at the real
# 1.23M-row scale (all else reference defaults, quantifies how much of the
# 0.70-nat r3 residual is the reference's aggressive plateau decay), and
# (b) a 300k-row ladder rung under the reference schedule (locates bsds300
# on the sample-size ladder). Clean runs — no mid-run stall haircut.
# The reference-schedule 1.23M-row headline rerun happens in the full
# parity_real pass (scripts/parity_real.py, 150 epochs).
set -u
cd "$(dirname "$0")/.."
OUT=runs/bsds300_r4
mkdir -p "$OUT"

echo "=== p10 control (1.23M rows) $(date)"
timeout 14400 python examples/train_uci.py -data bsds300 -nb_epoch 150 \
  -b_size 500 -synthetic -synthetic_rows -1 -s_rate 0.5 -s_patience 10 \
  -folder "$OUT/p10" || echo "P10 FAILED"
timeout 600 python scripts/snapshot_params.py "$OUT/p10/bsds300" -tag valid \
  || echo "P10 SNAPSHOT FAILED"

echo "=== 300k rung (reference schedule) $(date)"
timeout 7200 python examples/train_uci.py -data bsds300 -nb_epoch 150 \
  -b_size 500 -synthetic -synthetic_rows 300000 -s_rate 0.5 -s_patience 5 \
  -folder "$OUT/rung300k" || echo "RUNG FAILED"

echo "=== oracle at 300k $(date)"
timeout 3600 python scripts/oracle_gap.py -data bsds300 -rows 300000 \
  > "$OUT/oracle_300k.json" || echo "ORACLE FAILED"
echo "=== done $(date)"
