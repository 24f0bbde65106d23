#!/bin/bash
# Round-4 stage 2 (after the parity bsds300 leg finished at epoch 80):
#   1. bsds300 headline snapshots: step-65 (historical best-valid, whose
#      best-tag stash was lost to the mid-run kill) and step-80 (final),
#      each reproduced through the eval-only path;
#   2. quadrature-resolution probes on the pathological p10 run and the
#      healthy parity run (PARITY_RUNS §2e instability diagnosis);
#   3. the 300k-row bsds300 ladder rung under the reference schedule AND
#      the patience-10 control (clean schedule decomposition at rung scale);
#   4. the parity_real MNIST leg (AR(1) rho .9 at the real 60k-row MNIST
#      scale, wd 0 per the §3a ablation) and VAE leg, babysat;
#   5. table assembly.
# Strictly one TPU process at a time (CLAUDE.md dual-process stall hazard).
set -u
cd "$(dirname "$0")/.."
PB=runs/parity_real
BR=runs/bsds300_r4

echo "=== 1. bsds300 snapshots + eval-only repro $(date)"
timeout 900 python scripts/snapshot_params.py "$PB/uci/bsds300" -tag latest -step 65
timeout 900 python scripts/snapshot_params.py "$PB/uci/bsds300" -tag latest -step 80
for s in 65 80; do
  timeout 2400 python examples/train_uci.py -data bsds300 -test \
    -load_npz "$PB/uci/bsds300/params_step$s.f16.npz" \
    -synthetic -synthetic_rows -1 -folder "$PB/uci" \
    > "$PB/uci/bsds300/repro_step$s.log" 2>&1 || echo "REPRO step$s FAILED"
  tail -1 "$PB/uci/bsds300/repro_step$s.log"
done

echo "=== 2. quadrature-resolution probes $(date)"
timeout 3600 python scripts/quad_probe.py -data bsds300 \
  -folder "$BR/p10/bsds300" -rows 2000 -steps 50 100 200 500 1000 \
  > "$BR/quad_probe_p10.json" 2> "$BR/quad_probe_p10.log" || echo "PROBE p10 FAILED"
timeout 3600 python scripts/quad_probe.py -data bsds300 \
  -folder "$PB/uci/bsds300" -rows 2000 -steps 50 100 200 500 1000 \
  > "$PB/quad_probe_bsds.json" 2> "$PB/quad_probe_bsds.log" || echo "PROBE parity FAILED"

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
echo "=== stage2 done $(date)"
