#!/bin/bash
# Round-4 stage 5: AR(1) 784-d gate polish — test §3a's "the remaining
# distance to ~0.1 bpp is the plateau freeze" claim by continuing from the
# anneal's best params at a FIXED small LR (the anneal froze at lr 1.6e-5
# after halvings every patience window; a fixed 1e-4 should keep the
# descent the halvings kept interrupting, if the claim is right).
set -u
cd "$(dirname "$0")/.."
OUT=runs/mnist_r4_ar1_polish

echo "=== AR(1) polish: fixed lr 1e-4 from the anneal best $(date)"
python scripts/babysit.py --log "$OUT.log" --stall 900 --grace 3600 -- \
  python examples/train_mnist.py -nb_epoch 30 -synthetic \
  -synthetic_mode ar1 -ar1_rho 0.9 -ar1_rows 150000 -wd 0 -lr 1e-4 \
  -load_npz runs/mnist_r4_ar1_anneal/params_valid.f16.npz \
  -folder "$OUT" || echo "POLISH FAILED"

echo "=== snapshot + stats $(date)"
timeout 900 python scripts/snapshot_params.py "$OUT" -tag valid \
  || echo "SNAPSHOT FAILED"
tail -3 "$OUT/train.log"
echo "=== stage5 done $(date)"
