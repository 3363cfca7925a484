"""Host f64 direct solve: the MUMPS-equivalent fallback.

At production refinement the equilibrated KL-shell tangent reaches
cond ~1e12+: NO f32 factorization can represent it (measured: f32 LU
backward residual ~3e3 at the 20-patch wing, while the same kernels are
backward stable on well-conditioned matrices — it's precision, not a
kernel bug). The reference pays f64 MUMPS on the host for the same
reason (reference: GOLDFISH/utils/opt_utils.py:156-209). Here the
division of labor is: TPU computes the physics (residuals, Hessian
blocks, objectives, AD) in emulated f64; the HOST assembles the dense
tangent from the blocks and LU-factors it in native f64 (scipy). Below
~cond 1e10 the all-device GMRES-IR path (solver/blocks.py) is
preferable; set GOLDFISH_TPU_HOST_SOLVE=0 to force it.
"""

from __future__ import annotations

import os

import numpy as np
import scipy.linalg

from goldfish_tpu.solver.blocks import TangentBlocks
from goldfish_tpu.solver.system import SystemData

__all__ = ["enabled", "host_assemble", "host_factor", "host_solve",
           "host_direction", "PersistentHostFactor"]


def _get_jit_block_matvec():
    import jax

    from goldfish_tpu.solver.blocks import block_matvec

    return jax.jit(block_matvec)


class _LazyMV:
    _fn = None

    def __call__(self, data, blocks, x):
        if _LazyMV._fn is None:
            _LazyMV._fn = _get_jit_block_matvec()
        return _LazyMV._fn(data, blocks, x)


_jit_block_matvec = _LazyMV()


def enabled() -> bool:
    return os.environ.get("GOLDFISH_TPU_HOST_SOLVE", "1") != "0"


def host_assemble(data: SystemData, blocks: TangentBlocks) -> np.ndarray:
    """Dense f64 K on the host from device Hessian blocks."""
    stack = data.stack
    P, C = stack.n_patches, stack.max_cp
    N = P * C * 3
    conn = np.asarray(stack.conn)
    li = (conn[..., :, None] * 3 + np.arange(3)).reshape(
        P, conn.shape[1], -1)  # (P, E, 3L)
    gi = li + (np.arange(P) * C * 3)[:, None, None]
    Ke = np.asarray(blocks.Ke)

    K = np.zeros((N, N))
    rows = gi[..., :, None]          # (P, E, 3L, 1)
    cols = gi[..., None, :]          # (P, E, 1, 3L)
    np.add.at(K, (np.broadcast_to(rows, Ke.shape).ravel(),
                  np.broadcast_to(cols, Ke.shape).ravel()), Ke.ravel())

    if blocks.Ki is not None:
        ifs = data.ifs
        Ki = np.asarray(blocks.Ki)
        connA = np.asarray(ifs.connA)
        connB = np.asarray(ifs.connB)
        pairA = np.asarray(ifs.pairA)
        pairB = np.asarray(ifs.pairB)
        liA = (connA[..., :, None] * 3 + np.arange(3)).reshape(
            connA.shape[0], connA.shape[1], -1)
        liB = (connB[..., :, None] * 3 + np.arange(3)).reshape(
            connB.shape[0], connB.shape[1], -1)
        gA = liA + (pairA * C * 3)[:, None, None]
        gB = liB + (pairB * C * 3)[:, None, None]
        gAB = np.concatenate([gA, gB], axis=-1)  # (I, Nq, 6L)
        rows = np.broadcast_to(gAB[..., :, None], Ki.shape).ravel()
        cols = np.broadcast_to(gAB[..., None, :], Ki.shape).ravel()
        np.add.at(K, (rows, cols), Ki.ravel())

    free = np.asarray(data.free).reshape(-1)
    K *= free[:, None]
    K *= free[None, :]
    K[np.arange(N), np.arange(N)] += 1.0 - free
    return K


def host_factor(K: np.ndarray):
    return scipy.linalg.lu_factor(K, check_finite=False)


def host_solve(fac, b: np.ndarray) -> np.ndarray:
    return scipy.linalg.lu_solve(fac, b, check_finite=False)


def host_direction(data: SystemData, blocks: TangentBlocks, r):
    """delta = -K^{-1} r via the host f64 LU; r: (P, C, 3) device."""
    K = host_assemble(data, blocks)
    fac = host_factor(K)
    rn = np.asarray(r).reshape(-1)
    x = host_solve(fac, -rn)
    import jax.numpy as jnp

    return jnp.asarray(x.reshape(np.asarray(r).shape), dtype=r.dtype)


class PersistentHostFactor:
    """Amortized host f64 LU: keep ONE factorization across Newton
    iterations AND optimizer iterations; every solve is corrected by
    iterative refinement with EXACT device-side block matvecs at the
    CURRENT state, so solutions stay exact while the (expensive:
    device->host block transfer + assemble + factor, ~10 s over the
    axon tunnel) factorization is reused until the refinement stops
    converging. Warm-started optimization loops refactor almost never.
    """

    def __init__(self, data: SystemData, max_ir: int = 8, tol: float = 1e-10):
        self.data = data
        self.max_ir = max_ir
        self.tol = tol
        self.fac = None
        self.n_factor = 0

    def refactor(self, blocks: TangentBlocks):
        self.fac = host_factor(host_assemble(self.data, blocks))
        self.n_factor += 1

    def solve(self, blocks: TangentBlocks, b):
        """Solve K(blocks) x = b exactly (IR to self.tol); refactors
        (at most once per solve) when the stale factor stops
        contracting."""
        import jax.numpy as jnp

        if self.fac is None:
            self.refactor(blocks)

        shape = b.shape
        bn = float(jnp.linalg.norm(b))
        if bn == 0.0:
            return jnp.zeros_like(b)
        x = jnp.zeros_like(b)
        r = b
        prev = float("inf")
        refactored = False
        for _ in range(self.max_ir):
            dx = host_solve(self.fac, np.asarray(r).reshape(-1))
            x = x + jnp.asarray(dx.reshape(shape), dtype=b.dtype)
            r = b - _jit_block_matvec(self.data, blocks, x)
            rel = float(jnp.linalg.norm(r)) / bn
            if rel < self.tol:
                return x
            if rel > 0.5 * prev:  # stale factor no longer contracting
                if refactored:
                    break
                self.refactor(blocks)
                refactored = True
                x = jnp.zeros_like(b)
                r = b
                prev = float("inf")
                continue
            prev = rel
        return x
