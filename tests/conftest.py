"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated without TPU hardware via
XLA's host-platform device splitting; the driver separately dry-runs
the same code through __graft_entry__.dryrun_multichip.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

# The image's site hook pins JAX_PLATFORMS=axon (TPU tunnel) regardless of
# the env var, so force CPU through the config API as well.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="module", autouse=True)
def _fresh_jit_caches():
    """Drop compiled executables between test modules.

    A full-suite run accumulates hundreds of XLA:CPU executables in one
    process; compiling the large sharded shard_map program on top of
    that state segfaulted inside LLVM twice (at the same suite
    position, never in isolation).  Bounding the in-process executable
    count avoids the crash at the cost of some recompiles."""
    jax.clear_caches()
    yield


@pytest.fixture(scope="session")
def small_scene():
    from edgegraph3d_tpu.core.synthetic import make_scene

    return make_scene(n_cams=8, n_refpoints_per_curve=16,
                      width=320, height_px=240, focal=400.0, seed=3)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
