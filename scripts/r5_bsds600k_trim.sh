#!/bin/bash
# Round-5 VERDICT item 4, deadline-trimmed variant of r5_bsds600k.sh:
# train the 600k rung under the reference schedule (babysat), snapshot
# best-valid, and rely on train_uci's default-on validity stamp instead
# of the separate quad_probe leg (run the probe only if time remains —
# see r5_bsds600k.sh for the full protocol). The oracle leg is a cheap
# CPU GMM fit and runs separately. NB_EPOCH is a parameter so a late
# launch can cap the budget honestly (the rung's epoch count is recorded
# in args.json and reported next to the result).
set -u
cd "$(dirname "$0")/.."
OUT=runs/bsds300_r5
NB_EPOCH=${1:-150}
mkdir -p "$OUT"

echo "=== 600k rung (reference schedule, nb_epoch=$NB_EPOCH) $(date)"
python scripts/babysit.py --log "$OUT/rung600k.log" --stall 900 --grace 3600 -- \
  python examples/train_uci.py -data bsds300 -nb_epoch "$NB_EPOCH" \
  -b_size 500 -synthetic -synthetic_rows 600000 -s_rate 0.5 -s_patience 5 \
  -folder "$OUT/rung600k" || echo "RUNG FAILED"
timeout 900 python scripts/snapshot_params.py "$OUT/rung600k/bsds300" -tag valid \
  || echo "SNAPSHOT FAILED"
tail -3 "$OUT/rung600k/bsds300/train.log" 2>/dev/null
echo "=== done $(date)"
