#!/bin/bash
# Round-5 VERDICT item 4: the bsds300 600k ladder rung. Completes the
# flow-minus-oracle n-scaling curve 3.19 (300k) -> ? (600k) -> 0.63 (1.23M)
# so PARITY_RUNS §2b can say whether the full-scale 0.63-nat residual is
# saturation (miniboone-style 0.14-0.15 plateau) or still falling with n.
# Reference schedule (`UCIExperiments.py:125-192` config), babysat,
# validity-probed per the §2e protocol.
set -u
cd "$(dirname "$0")/.."
OUT=runs/bsds300_r5
mkdir -p "$OUT"

echo "=== 600k rung (reference schedule) $(date)"
python scripts/babysit.py --log "$OUT/rung600k.log" --stall 900 --grace 3600 -- \
  python examples/train_uci.py -data bsds300 -nb_epoch 150 \
  -b_size 500 -synthetic -synthetic_rows 600000 -s_rate 0.5 -s_patience 5 \
  -folder "$OUT/rung600k" || echo "RUNG FAILED"
timeout 900 python scripts/snapshot_params.py "$OUT/rung600k/bsds300" -tag valid \
  || echo "SNAPSHOT FAILED"

echo "=== oracle at 600k $(date)"
timeout 3600 python scripts/oracle_gap.py -data bsds300 -rows 600000 \
  > "$OUT/oracle_600k.json" || echo "ORACLE FAILED"

echo "=== validity probe $(date)"
timeout 3600 python scripts/quad_probe.py -data bsds300 -synthetic_rows 600000 \
  -folder "$OUT/rung600k/bsds300" -rows 2000 -steps 50 200 1000 \
  > "$OUT/quad_probe_rung600k.json" 2> "$OUT/quad_probe_rung600k.log" \
  || echo "PROBE FAILED"
tail -3 "$OUT/rung600k/bsds300/train.log" 2>/dev/null
echo "=== done $(date)"
