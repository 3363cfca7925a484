"""Global configuration: dtypes and precision policy.

The reference stack runs everything in float64 through PETSc/MUMPS
(reference: GOLDFISH/utils/opt_utils.py:106-209). On TPU, float64 is
emulated and slow; the policy here is:

  - `solve_dtype`: dtype used for states/residuals/linear algebra.
    Defaults to float64 when JAX x64 is enabled (tests / parity runs on
    CPU), float32 otherwise (TPU production).
  - Iterative refinement in the linear solvers recovers accuracy in f32.

Call :func:`use_x64` early (before creating arrays) to flip JAX into
float64 mode for gradient-parity work.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def use_x64(enable: bool = True) -> None:
    """Enable/disable 64-bit mode globally (must run before tracing)."""
    jax.config.update("jax_enable_x64", enable)


def x64_enabled() -> bool:
    return bool(jax.config.read("jax_enable_x64"))


def solve_dtype():
    """Default dtype for states / linear algebra."""
    return jnp.float64 if x64_enabled() else jnp.float32


def index_dtype():
    return jnp.int32


# Environment knob: GOLDFISH_TPU_X64=1 enables x64 at import time.
if os.environ.get("GOLDFISH_TPU_X64", "0") == "1":  # pragma: no cover
    use_x64(True)

# Persistent compilation cache: TPU kernels for the shell pipeline take
# minutes to build; cache them across processes (XLA hashes the HLO, so
# stale entries are never reused incorrectly).
_cache_dir = os.environ.get("GOLDFISH_TPU_CACHE",
                            os.path.expanduser("~/.cache/goldfish_tpu_xla"))


def _enable_compile_cache():  # pragma: no cover
    # TPU/accelerator backends only: XLA:CPU AOT cache entries are
    # machine-feature-specific and reload unsafely across hosts.
    try:
        if jax.default_backend() == "cpu":
            return
        os.makedirs(_cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass


if _cache_dir and _cache_dir != "0":  # pragma: no cover
    _enable_compile_cache()
