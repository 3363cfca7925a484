"""Linear solves for the tangent systems — TPU mixed-precision core.

The reference leans on MUMPS f64 direct solves through PETSc
(reference: GOLDFISH/utils/opt_utils.py:156-209 `solve_Ax_b`, and KSP
CG at :106-133). TPU v5e has no native f64 dense factorization (XLA
emulates f64 matmul/elementwise, but `lu_factor`/`solve` only compile
in f32), and KL-shell tangents are savagely ill-conditioned
(cond ~ 1e10-1e12 even after equilibration), far beyond a plain f32
solve. The TPU-native answer is GMRES-IR (Carson & Higham, SIAM 2018):

  1. symmetric Jacobi equilibration  K~ = D K D,    D = diag(K)^(-1/2)
  2. f32 LU factorization of K~ on the MXU           (fast, stable)
  3. f64(-emulated) GMRES on K~ preconditioned by the f32 LU;
     the preconditioned operator has cond ~ 1 + cond(K~) * eps_f32,
     so convergence takes O(tens) of cheap O(N^2) iterations.

On CPU (tests, x64 parity runs) `mode() == 'direct'` short-circuits to
a native f64 LU solve. Set GOLDFISH_TPU_LINEAR=direct|mixed to force.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

__all__ = ["linear_solve", "set_mode", "mode"]

_MODE: str | None = None


def set_mode(m: str | None):
    """'direct', 'mixed', or None for backend-based auto."""
    global _MODE
    assert m in (None, "direct", "mixed")
    _MODE = m


def mode() -> str:
    if _MODE is not None:
        return _MODE
    env = os.environ.get("GOLDFISH_TPU_LINEAR")
    if env in ("direct", "mixed"):
        return env
    return "direct" if jax.default_backend() == "cpu" else "mixed"


def _equilibrate(K):
    d = jax.lax.rsqrt(jnp.abs(jnp.diagonal(K)) + 1e-300)
    return K * d[:, None] * d[None, :], d


def mixed_solve(K, b, tol=1e-11, restart=32, maxiter=8):
    """GMRES-IR: f32 LU preconditioner, working-dtype Krylov loop."""
    Keq, dscale = _equilibrate(K)
    lu, piv = jax.scipy.linalg.lu_factor(Keq.astype(jnp.float32))
    beq = dscale * b

    def Aop(y):
        return Keq @ y

    def Mop(r):
        y = jax.scipy.linalg.lu_solve((lu, piv), r.astype(jnp.float32))
        return y.astype(K.dtype)

    y, _ = jax.scipy.sparse.linalg.gmres(
        Aop, beq, tol=tol, atol=0.0, restart=restart, maxiter=maxiter,
        M=Mop, solve_method="batched")
    return dscale * y


def factor(K):
    """Reusable factorization of K (dispatches on mode()).

    'direct': native LU. 'mixed': equilibration + f32 LU + K itself
    (kept for the f64 GMRES-IR matvecs)."""
    if mode() == "direct":
        return ("direct", jax.scipy.linalg.lu_factor(K))
    Keq, dscale = _equilibrate(K)
    lu, piv = jax.scipy.linalg.lu_factor(Keq.astype(jnp.float32))
    return ("mixed", (Keq, dscale, lu, piv))


def factor_solve(fac, b, tol=1e-11, restart=32, maxiter=8):
    """Solve K x = b with a factorization from `factor`."""
    kind, payload = fac
    if kind == "direct":
        return jax.scipy.linalg.lu_solve(payload, b)
    Keq, dscale, lu, piv = payload
    beq = dscale * b

    def Aop(y):
        return Keq @ y

    def Mop(r):
        y = jax.scipy.linalg.lu_solve((lu, piv), r.astype(jnp.float32))
        return y.astype(b.dtype)

    y, _ = jax.scipy.sparse.linalg.gmres(
        Aop, beq, tol=tol, atol=0.0, restart=restart, maxiter=maxiter,
        M=Mop, solve_method="batched")
    return dscale * y


def linear_solve(K, b, tol=1e-11):
    """Solve K x = b (dense K, single RHS vector b).

    Dispatches at trace time on `mode()`: native direct LU on CPU,
    GMRES-IR mixed precision on TPU.
    """
    if mode() == "direct":
        return jnp.linalg.solve(K, b)
    return mixed_solve(K, b, tol=tol)


def cast_floating(tree, dtype):
    """Cast every inexact-dtype leaf of a pytree (e.g. SystemData)."""
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.inexact)
        else x,
        tree)
