"""C++ PJRT serving-host tests.

The binary is the TF-Serving analog: it loads a PJRT plugin and serves
exported StableHLO. No PJRT CPU C-API plugin ships in this environment
(only libtpu, whose client needs a locally attached chip), so coverage
here is: the binary builds, loads the plugin, reports the API version,
and fails client creation gracefully; plus the exporter emits the raw
`module.mlir` the host consumes.
"""

import os
import subprocess

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HOST = os.path.join(REPO, "native", "build", "pjrt_host")
LIBTPU = "/opt/venv/lib/python3.12/site-packages/libtpu/libtpu.so"


def _build_host():
    if os.path.exists(HOST):
        return True
    proc = subprocess.run(
        ["bash", os.path.join(REPO, "tools", "build_native.sh")],
        capture_output=True,
        text=True,
    )
    return os.path.exists(HOST)


pytestmark = pytest.mark.skipif(
    not _build_host(), reason="pjrt_host build unavailable"
)


def test_usage_error():
    proc = subprocess.run([HOST], capture_output=True, text=True)
    assert proc.returncode == 2
    assert "usage" in proc.stderr


@pytest.mark.skipif(
    not os.path.exists(LIBTPU), reason="libtpu plugin unavailable"
)
def test_loads_plugin_and_reports_api_version():
    proc = subprocess.run(
        [HOST, LIBTPU, "info"],
        capture_output=True,
        text=True,
        timeout=120,
    )
    # Plugin loads and the C API handshake succeeds regardless of
    # whether a chip is attached.
    assert "pjrt_api_version:" in proc.stdout
    # Without a locally attached TPU, client creation must fail with a
    # readable error (not crash).
    if proc.returncode != 0:
        assert "PJRT_Client_Create failed" in proc.stderr


def test_export_emits_raw_mlir(tmp_path):
    import jax
    import jax.numpy as jnp

    from recommenders_tpu.utils import export as export_lib

    def f(x, y):
        return x @ y.T

    path = str(tmp_path / "m")
    export_lib.export_fn(
        path, f, jnp.ones((4, 8)), jnp.ones((16, 8))
    )
    mlir = open(os.path.join(path, "module.mlir")).read()
    assert "stablehlo" in mlir and "func" in mlir
    # And the jax-side payload still round-trips.
    served = export_lib.load_fn(path)
    np.testing.assert_allclose(
        np.asarray(served(jnp.ones((4, 8)), jnp.ones((16, 8)))),
        8.0 * np.ones((4, 16)),
    )
