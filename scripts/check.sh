#!/usr/bin/env bash
# Full local validation: test suite (CPU, 8 virtual devices), driver entry
# points (single-chip compile check + multichip dryrun), and the benchmark.
set -euo pipefail
cd "$(dirname "$0")/.."
echo "== pytest =="
python -m pytest tests/ -x -q
echo "== graft entry (multichip dryrun on virtual CPU mesh) =="
python __graft_entry__.py
echo "== bench (real chip) =="
python bench.py
