#!/usr/bin/env bash
# Release gate: syntax lint, full test suite, example sweep, self-checks.
# Counterpart of the reference's tools/build_scripts/test.sh.
set -euo pipefail
cd "$(dirname "$0")/.."

python -m compileall -q recommenders_tpu tools benchmarks examples
python -m pytest tests/ -q
XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
    python tools/run_examples.py --timeout 400
python __graft_entry__.py
echo "release checks passed"
