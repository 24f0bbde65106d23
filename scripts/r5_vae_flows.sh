#!/bin/bash
# Round-5 VERDICT item 5: train each non-MMAF VAE posterior flow once.
# The reference trains all of them via `TrainVaeFlow.py:77-80,192-207`;
# rounds 2-4 only ever *trained* MMAF (the others' log-dets are verified
# against autodiff in tests/test_vae.py:105-172 but their ELBOs never
# descended under the driver). Five short synthetic static-MNIST runs,
# strictly one TPU process at a time (CLAUDE.md), committed metrics.jsonl
# each — evidence that every flow's log-det wiring behaves in training.
set -u
cd "$(dirname "$0")/.."
OUT=runs/vae_r5
mkdir -p "$OUT"

for FLOW in planar iaf orthogonal householder triangular; do
  echo "=== vae flow $FLOW $(date)"
  timeout 2400 python examples/train_vae.py -dataset mnist -flow "$FLOW" \
    -nb_epoch 12 -early_stopping_epochs 12 -synthetic \
    -iwae_samples 200 -iwae_minibatch 100 \
    -folder "$OUT" -plot_every 0 || echo "$FLOW FAILED"
done
echo "=== summary $(date)"
for FLOW in planar iaf orthogonal householder triangular; do
  d=$(ls -d "$OUT"/mnist_"$FLOW"* 2>/dev/null | head -1)
  [ -n "$d" ] && echo "-- $FLOW" && grep -E "epoch +0 |epoch +11 |FINAL" "$d/train.log" | head -4
done
echo "=== done $(date)"
