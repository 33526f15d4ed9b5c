"""Test configuration: run all tests on a simulated 8-device CPU mesh.

The driver benches on real TPU; tests exercise the same code paths (including
multi-chip sharding) on virtual CPU devices so they are hermetic and fast.

This environment ships an `axon` remote-TPU PJRT plugin via sitecustomize
whose initialize() blocks when the selected platform is cpu — so in addition
to forcing JAX_PLATFORMS=cpu we unregister that backend factory before the
first JAX operation triggers backend discovery.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    from jax._src import xla_bridge as _xb

    _xb._backend_factories.pop("axon", None)
except Exception:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
