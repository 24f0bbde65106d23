#!/bin/bash
# Round-4 stage 3: remaining pipeline after the bsds300 snapshot/probe work
# (stage 2 steps 1-2). Strictly one TPU process at a time.
set -u
cd "$(dirname "$0")/.."
PB=runs/parity_real
BR=runs/bsds300_r4

echo "=== 3a. bsds300 300k rung, reference schedule $(date)"
python scripts/babysit.py --log "$BR/rung300k.log" --stall 600 --grace 1800 -- \
  python examples/train_uci.py -data bsds300 -nb_epoch 150 -b_size 500 \
  -synthetic -synthetic_rows 300000 -s_rate 0.5 -s_patience 5 \
  -folder "$BR/rung300k" || echo "RUNG FAILED"

echo "=== 3b. bsds300 300k rung, patience-10 control $(date)"
python scripts/babysit.py --log "$BR/rung300k_p10.log" --stall 600 --grace 1800 -- \
  python examples/train_uci.py -data bsds300 -nb_epoch 150 -b_size 500 \
  -synthetic -synthetic_rows 300000 -s_rate 0.5 -s_patience 10 \
  -folder "$BR/rung300k_p10" || echo "RUNG P10 FAILED"

echo "=== 3c. rung quad probes (validity check at the rung scale) $(date)"
timeout 3600 python scripts/quad_probe.py -data bsds300 -synthetic_rows 300000 \
  -folder "$BR/rung300k/bsds300" -rows 2000 -steps 50 200 1000 \
  > "$BR/quad_probe_rung.json" 2> "$BR/quad_probe_rung.log" || echo "PROBE rung FAILED"
timeout 3600 python scripts/quad_probe.py -data bsds300 -synthetic_rows 300000 \
  -folder "$BR/rung300k_p10/bsds300" -rows 2000 -steps 50 200 1000 \
  > "$BR/quad_probe_rung_p10.json" 2> "$BR/quad_probe_rung_p10.log" || echo "PROBE rung p10 FAILED"

echo "=== 4a. parity mnist leg $(date)"
python scripts/babysit.py --log "$PB/mnist_leg.log" --stall 1200 --grace 3600 -- \
  python examples/train_mnist.py -nb_epoch 40 -nb_steps 0 \
  -folder "$PB/mnist" -synthetic -synthetic_mode ar1 -ar1_rho 0.9 \
  -ar1_rows 60000 -wd 0 || echo "MNIST LEG FAILED"

echo "=== 4b. parity vae leg $(date)"
python scripts/babysit.py --log "$PB/vae_leg.log" --stall 1200 --grace 3600 \
  --resume-arg "" -- \
  python examples/train_vae.py -dataset mnist -flow MMAF -steps 0 \
  -nb_epoch 30 -folder "$PB/vae" -plot_every 0 -synthetic || echo "VAE LEG FAILED"

echo "=== 5. assemble $(date)"
python scripts/parity_assemble.py
echo "=== stage3 done $(date)"
