"""Test configuration: run JAX on a virtual 8-device CPU mesh with float64.

Correctness tests never need real TPU hardware; the multi-chip sharding
tests use XLA's host-platform device virtualization.
"""

import os

# Force CPU even when the ambient environment selects a TPU plugin
# (JAX_PLATFORMS=axon, registered by a sitecustomize that imports jax
# before this file runs): correctness tests need float64 and virtual
# devices, so override via jax.config, which works post-import as long as
# no backend has been initialized yet.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_ENABLE_X64"] = "true"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

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
