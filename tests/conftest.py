"""Test configuration: CPU backend with 8 virtual devices, float64.

Gradient-parity and correctness tests run on CPU in f64 (the TPU
production path is f32 + iterative refinement; the bench exercises that
separately on real hardware).
"""

import os

# Virtual device count must be set before the CPU backend initializes.
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# NOTE: this environment pre-imports jax via sitecustomize with
# JAX_PLATFORMS=axon (real TPU); the env var is frozen by then, so the
# config update is the only reliable override.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled-executable memory between test modules: the suite
    compiles hundreds of distinct XLA CPU programs and the in-process
    executable cache eventually crashes the CPU backend compiler
    (SIGSEGV ~70-85% into a single-process full run). Same-module
    tests keep their cache; cross-module reuse is minimal anyway."""
    yield
    jax.clear_caches()
