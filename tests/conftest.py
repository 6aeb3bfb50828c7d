"""Test configuration: run JAX on a virtual 8-device CPU mesh with float64.

Correctness tests never need real TPU hardware; the multi-chip sharding
tests use XLA's host-platform device virtualization.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "true")

import pytest  # noqa: E402

REFERENCE_DIR = "/root/reference"


def reference_path(*parts):
    return os.path.join(REFERENCE_DIR, *parts)


@pytest.fixture(scope="session")
def capbuf_0000():
    """The recorded 739 MHz capture with cell ID 271 (reference test anchor)."""
    from lte_cell_scanner_tpu.io.itfile import load_it

    path = reference_path("test", "capbuf_0000.it")
    if not os.path.exists(path):
        pytest.skip("reference capture not available")
    d = load_it(path)
    return d["capbuf"], float(d["fc"][0])
