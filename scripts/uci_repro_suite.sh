#!/bin/bash
# Reproducible-headline suite (round-4 VERDICT item 2): rerun the cheap
# real-scale synthetic UCI configs with the exact r3 arguments, export a
# committable f16 best-valid snapshot for each, and immediately reproduce
# the headline test NLL from that snapshot via the eval-only path
# (`-test -load_npz`, matching UCIExperiments.py:93-122 semantics).
# Sequential on purpose: one TPU job at a time beside the long MNIST run.
set -u
cd "$(dirname "$0")/.."
OUT=runs/uci_r4
mkdir -p "$OUT"

run_one () {
  local data=$1 epochs=$2
  echo "=== $data ($epochs epochs) $(date)"
  timeout 7200 python examples/train_uci.py -data "$data" -nb_epoch "$epochs" \
    -b_size 500 -synthetic -synthetic_rows -1 -s_rate 0.5 -s_patience 5 \
    -folder "$OUT" || { echo "TRAIN FAILED: $data"; return 1; }
  timeout 600 python scripts/snapshot_params.py "$OUT/$data" -tag valid \
    || { echo "SNAPSHOT FAILED: $data"; return 1; }
  timeout 1200 python examples/train_uci.py -data "$data" -test \
    -load_npz "$OUT/$data/params_valid.f16.npz" -synthetic -synthetic_rows -1 \
    -folder "$OUT" > "$OUT/$data/repro_test.log" 2>&1 \
    || { echo "REPRO FAILED: $data"; return 1; }
  tail -2 "$OUT/$data/repro_test.log"
}

run_one power 15
run_one gas 25
run_one hepmass 65
run_one miniboone 400
echo "=== suite done $(date)"
