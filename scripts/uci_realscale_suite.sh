#!/usr/bin/env bash
# Round-3 synthetic convergence suite at REAL dataset row counts
# (VERDICT r2 next-step #1): each stand-in's train split matches the real
# dataset's size, so the exact floors become reachable and the gaps gate.
# Epoch counts chosen to give each dataset ~25-65k optimizer steps.
set -uo pipefail
cd "$(dirname "$0")/.."
OUT=${1:-runs/uci_r3}
run() {
  ds=$1; ep=$2
  echo "=== $ds ($ep epochs, real-scale rows) ===" 
  timeout 14400 python examples/train_uci.py -data "$ds" -synthetic \
    -synthetic_rows -1 -nb_epoch "$ep" -folder "$OUT"
  echo "$ds exit: $?"
}
run power 15
run gas 25
run hepmass 65
run bsds300 20
run miniboone 400
