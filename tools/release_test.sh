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

# TPU-hardware stage: compiled Pallas kernels + the native serving host
# executing an exported index on the chip (tests/test_tpu_hardware.py).
# Runs only when the axon plugin is present; slow (~15 min: each phase
# claims the single chip through the tunnel, serially).
if [ -e /opt/axon/libaxon_pjrt.so ] && [ "${RTPU_SKIP_TPU_STAGE:-0}" != "1" ]; then
  RTPU_TPU_TESTS=1 python -m pytest tests/test_tpu_hardware.py -q
fi
echo "release checks passed"
