#!/bin/bash
# Round-5 VERDICT item 5, CPU variant: train each non-MMAF VAE posterior
# flow once (the reference trains all of them via TrainVaeFlow.py:77-80,
# 192-207; rounds 2-4 only trained MMAF). These posteriors are small
# matrix flows — no UMNN integrand — so the 600-row synthetic static-MNIST
# runs fit on the host CPU, which keeps the TPU free for the round's long
# parity runs (CLAUDE.md: strictly one TPU process at a time). JAX truly
# honors CPU here because umnn_tpu/__init__ mirrors JAX_PLATFORMS into
# jax.config before backend init (r3 fix). niced so a concurrent TPU
# job's host thread keeps priority on the 1-core box.
set -u
cd "$(dirname "$0")/.."
OUT=runs/vae_r5
mkdir -p "$OUT"

for FLOW in "$@"; do
  echo "=== vae flow $FLOW (cpu) $(date)"
  JAX_PLATFORMS=cpu nice -n 15 timeout 3600 python examples/train_vae.py \
    -dataset mnist -flow "$FLOW" \
    -nb_epoch 12 -early_stopping_epochs 12 -synthetic \
    -iwae_samples 100 -iwae_minibatch 50 \
    -folder "$OUT" -plot_every 0 || echo "$FLOW FAILED"
done
echo "=== done $(date)"
