"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors the reference's strategy of testing GPU kernel logic on a CPU
runtime (``cubecl::cpu::CpuRuntime``, e.g. ivf_gpu.rs:853-947): all kernels
and sharded paths are exercised on CPU devices; the real chip only runs
benchmarks.
"""

import os

# Force CPU even if the ambient environment points at a real TPU — tests
# always run on the virtual 8-device CPU mesh. Note: the image's
# sitecustomize imports jax at interpreter startup, so the JAX_PLATFORMS env
# var is already baked into jax.config; override via config.update instead
# (XLA_FLAGS is still read lazily at first backend init, so the env var
# works for the device count).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Tests exercise the NATIVE query algorithms: without this, every
# small-workload recall test would silently route through the small-regime
# exact MXU fallback (models/base.BRUTE_QUERY_FLOP_BUDGET) and assert
# nothing about the structure under test. test_exact_fallback.py covers
# the fallback path explicitly.
os.environ["ANNSEARCH_NO_EXACT_FALLBACK"] = "1"

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is dominated by XLA compiles.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def small_points():
    """5-point 3-D fixture in the spirit of the reference's index tests
    (cpu/exhaustive.rs:281-543)."""
    return np.array(
        [
            [1.0, 0.0, 0.0],
            [0.0, 1.0, 0.0],
            [0.0, 0.0, 1.0],
            [1.0, 1.0, 0.0],
            [2.0, 0.0, 0.0],
        ],
        dtype=np.float32,
    )
