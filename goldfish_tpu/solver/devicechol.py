"""On-TPU f64 direct solver: blocked Cholesky + device IR.

The production linear solver for the TPU path. Per Newton/adjoint
solve:

  1. exact dense f64 tangent on device from the Hessian blocks
     (emulated-f64 scatter, validated bit-accurate at bench scale);
  2. blocked f64 Cholesky (solver/tpu_cholesky.py): ~1.7 s at N=6600 —
     5x the host scipy LU including its transfers;
  3. triangular solves (0.07 s) + device iterative refinement with the
     exact dense matvec: the axon f64 emulation leaves a ~3e-3 one-shot
     residual at cond ~1e12; 3-4 IR sweeps reach ~1e-10.

Stale factors are NOT reused across design changes: at cond ~1e12 even
a 1e-4 relative change in K makes refinement with a stale factor
diverge (||fac^{-1} dK|| ~ cond * 1e-4 >> 1) — the same reason the
reference refactors MUMPS every Newton iteration.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from goldfish_tpu.solver.blocks import TangentBlocks
from goldfish_tpu.solver.system import SystemData
from goldfish_tpu.solver.tpu_cholesky import DeviceCholesky

__all__ = ["enabled", "dense64_from_blocks", "DeviceDirectSolver"]


def enabled() -> bool:
    return os.environ.get("GOLDFISH_TPU_DEVICE_CHOL", "1") != "0"


@jax.jit
def dense64_from_blocks(data: SystemData, blocks: TangentBlocks):
    """Exact dense f64 K from the Hessian blocks (emulated-f64 scatter;
    validated bit-accurate against the host assembly at bench scale —
    unlike a hi/lo two-f32 scatter, whose RUNNING-SUM rounding under
    overlapping adds leaves ~eps_f32 errors that break IR at
    cond ~1e12)."""
    from goldfish_tpu.solver.system import (
        _interface_global_dofs,
        element_global_dofs,
    )

    stack = data.stack
    P, C = stack.n_patches, stack.max_cp
    N = P * C * 3
    K = jnp.zeros((N, N), dtype=blocks.Ke.dtype)
    gi = element_global_dofs(stack)
    K = K.at[gi[..., :, None], gi[..., None, :]].add(blocks.Ke)
    if blocks.Ki is not None:
        gii = _interface_global_dofs(data.ifs, C)
        K = K.at[gii[..., :, None], gii[..., None, :]].add(blocks.Ki)
    free = data.free.reshape(-1)
    K = K * free[:, None] * free[None, :]
    K = K + jnp.diag(1.0 - free)
    return K


@jax.jit
def _dense_matvec(K, x):
    return K @ x


class DeviceDirectSolver:
    """factor(data, blocks) then solve(b) with device IR to `tol`."""

    def __init__(self, nb: int = 220, tol: float = 1e-10, max_ir: int = 3):
        self.dc = DeviceCholesky(nb=nb)
        self.tol = tol
        self.max_ir = max_ir
        self._K = None

    def factor(self, data: SystemData, blocks: TangentBlocks):
        self._K = dense64_from_blocks(data, blocks)
        self.dc.factor(self._K)
        return self

    def factor_from_K(self, K):
        self._K = K
        self.dc.factor(K)
        return self

    def solve(self, b, n_ir=None):
        """Fixed IR sweeps without host readbacks (each convergence
        check costs a ~27 ms tunnel roundtrip; the axon one-shot
        residual is ~3e-3 and each sweep multiplies it, so 3 sweeps
        reach ~1e-10 deterministically)."""
        n_ir = self.max_ir if n_ir is None else n_ir
        bf = b.reshape(-1)
        x = self.dc.solve(bf)
        for _ in range(n_ir):
            r = bf - _dense_matvec(self._K, x)
            x = x + self.dc.solve(r)
        return x.reshape(b.shape)