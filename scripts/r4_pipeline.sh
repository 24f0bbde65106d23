#!/bin/bash
# Round-4 post-anneal TPU pipeline. Waits for the flagship AR(1) anneal
# (PID $1) to finish, then runs the serialized TPU queue:
#   1. snapshot the anneal's best-valid + latest params (committable f16)
#   2. MFU attribution measurements (exclusive chip, clean numbers)
#   3. UCI repro suite (power/gas/hepmass/miniboone + snapshots + -test repro)
#   4. Freyfaces MMAF rerun + snapshot + npz eval-only reproduction
#   5. launch the full parity_real synthetic pass and, 10 min staggered,
#      the bsds300 treatment (the only concurrent phase; both checkpoint)
set -u
cd "$(dirname "$0")/.."
ANNEAL_PID=${1:?usage: r4_pipeline.sh ANNEAL_PID}

echo "=== waiting for anneal PID $ANNEAL_PID $(date)"
while kill -0 "$ANNEAL_PID" 2>/dev/null; do sleep 60; done
echo "=== anneal done $(date)"
sleep 30

python scripts/snapshot_params.py runs/mnist_r4_ar1_anneal -tag valid \
  || echo "ANNEAL SNAPSHOT valid FAILED"
python scripts/snapshot_params.py runs/mnist_r4_ar1_anneal -tag latest \
  || echo "ANNEAL SNAPSHOT latest FAILED"

echo "=== mfu attribution $(date)"
timeout 2700 python scripts/mfu_attribution.py > runs/mfu_attribution.log 2>&1 \
  || echo "MFU FAILED"
tail -20 runs/mfu_attribution.log

echo "=== uci repro suite $(date)"
bash scripts/uci_repro_suite.sh

echo "=== freyfaces rerun $(date)"
timeout 3600 python examples/train_vae.py -dataset freyfaces -flow MMAF \
  -steps 0 -nb_epoch 30 -folder runs/vae_r4 -plot_every 0 -synthetic \
  || echo "FREYFACES FAILED"
timeout 600 python scripts/snapshot_params.py runs/vae_r4/freyfaces_MMAF -tag valid \
  || echo "FREY SNAPSHOT FAILED"
timeout 1800 python examples/train_vae.py -dataset freyfaces -flow MMAF \
  -steps 0 -eval_only -load_npz runs/vae_r4/freyfaces_MMAF/params_valid.f16.npz \
  -folder runs/vae_r4 -plot_every 0 -synthetic \
  > runs/vae_r4/freyfaces_MMAF/repro_eval.log 2>&1 || echo "FREY REPRO FAILED"
tail -3 runs/vae_r4/freyfaces_MMAF/repro_eval.log

echo "=== launching parity_real full + bsds300 treatment $(date)"
nohup python scripts/parity_real.py > runs/parity_real_full.log 2>&1 &
PR_PID=$!
sleep 600
nohup bash scripts/bsds300_treatment.sh > runs/bsds300_treatment.log 2>&1 &
BS_PID=$!
echo "parity_real PID $PR_PID, bsds300 PID $BS_PID"
wait $PR_PID; echo "=== parity_real done $(date)"
wait $BS_PID; echo "=== bsds300 treatment done $(date)"
echo "=== pipeline done $(date)"
