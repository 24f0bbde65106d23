#!/usr/bin/env bash
# One-command real-data parity harness (VERDICT r2 next-step #5).
#
#   scripts/parity_real.sh [DATA_ROOT] [extra parity_real.py args...]
#
# Checks which reference datasets are mounted under DATA_ROOT (default
# $UMNN_DATA_ROOT or datasets/data), trains each available workload at the
# reference CLI defaults, falls back to the exact-floor synthetic gates for
# the rest, and prints a BASELINE.md-vs-measured table. Needs zero edits
# when real files appear. See scripts/parity_real.py for the layout.
set -euo pipefail
cd "$(dirname "$0")/.."
ROOT="${1:-${UMNN_DATA_ROOT:-datasets/data}}"
shift || true
exec python scripts/parity_real.py --root "$ROOT" "$@"
