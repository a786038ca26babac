"""Test configuration: force a virtual 8-device CPU platform.

Real-TPU compiles through the tunnel take >60s per kernel shape; the unit
tests exercise numerics and parity, which are platform independent. Sharding
tests use the 8 virtual CPU devices.
"""

import os

# override unconditionally: the driver environment pre-sets JAX_PLATFORMS to
# the remote TPU platform (multi-second per-dispatch latency), and a
# sitecustomize hook re-registers it via jax.config — so both the env var
# and the config value must be forced back to cpu.
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if not os.environ.get("CIGWAS_TESTS_ON_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE)


requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not available"
)


@pytest.fixture(scope="session")
def n10_fixture():
    """Golden 10-variable skeleton fixture (A_N10 / C_N10).

    Loaded from the committed cache; regenerated from the reference tree by
    tests/tools/extract_fixtures.py when available.
    """
    path = os.path.join(os.path.dirname(__file__), "data", "n10.npz")
    if not os.path.exists(path):
        pytest.skip("n10 fixture cache missing; run tests/tools/extract_fixtures.py")
    data = np.load(path)
    return data["C"], data["A"], float(data["alpha"]), int(data["sample_size"])
