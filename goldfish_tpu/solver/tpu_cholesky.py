"""Blocked f64 Cholesky ON TPU, built from emulated-f64 matmuls.

XLA:TPU emulates f64 matmul at multi-Tflop/s on v5e but provides NO f64
factorization kernels (`lu_factor`/`cholesky` fail to compile), and
every f32 factorization is meaningless at KL-shell conditioning
(cond ~1e12). This module closes that gap: a left-looking blocked
Cholesky where

  - the per-panel trailing update is one full-width f64 matmul
    (N, N) @ (N, nb) — the MXU does the heavy lifting;
  - the nb x nb panel factorization + inversion run as an unrolled
    column recursion of f64 vector ops inside the same program;
  - panel shapes are STATIC (full-height columns masked below the
    panel), so the whole factorization is one fixed-shape fori_loop
    program — no dynamic shapes, no gather/scatter patterns (the ops
    that corrupt on the axon backend; CLAUDE.md).

The factor returns (L, panel_inverses); triangular solves are blocked
substitutions using the stored panel inverses — again pure matmuls.
This replaces the host scipy LU (the MUMPS role) with a device-resident
f64 direct solver: ~N^3 emulated-f64 matmul flops per factorization.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["blocked_cholesky", "blocked_chol_solve", "DeviceCholesky"]


def _panel_chol_and_inv(A):
    """Cholesky L of an (nb, nb) SPD block AND inv(L), via an unrolled
    column recursion (nb static, modest: <= 512)."""
    nb = A.shape[0]
    L = jnp.zeros_like(A)
    M = jnp.eye(nb, dtype=A.dtype)  # will become inv(L)

    def body(j, carry):
        L, M = carry
        # column j of the factor
        ljj2 = A[j, j] - jnp.sum(L[j, :] ** 2)
        ljj = jnp.sqrt(jnp.maximum(ljj2, 1e-300))
        col = (A[:, j] - L @ L[j, :]) / ljj
        rows = jnp.arange(nb)
        col = jnp.where(rows > j, col, 0.0).at[j].set(ljj)
        L = L.at[:, j].set(col)
        # forward substitution on the identity: row j of inv(L)
        # inv rows: M[j, :] = (e_j - L[j, :j] @ M[:j, :]) / ljj
        mrow = (jnp.eye(nb, dtype=A.dtype)[j]
                - (L[j, :] * (rows < j)) @ M) / ljj
        M = M.at[j, :].set(mrow)
        return L, M

    L, M = jax.lax.fori_loop(0, nb, body, (L, M))
    return L, M


@partial(jax.jit, static_argnames=("nb",))
def blocked_cholesky(K, nb: int = 220):
    """K: (N, N) SPD, N divisible by nb. Returns (L, invs) with
    L lower-triangular (K = L L^T) and invs: (N/nb, nb, nb) the
    inverses of the diagonal panels."""
    N = K.shape[0]
    assert N % nb == 0, (N, nb)
    np_ = N // nb
    L = jnp.zeros_like(K)
    invs = jnp.zeros((np_, nb, nb), dtype=K.dtype)
    rows = jnp.arange(N)

    def body(k, carry):
        L, invs = carry
        c0 = k * nb
        # full-height panel of the Schur complement: static shapes
        Kcols = jax.lax.dynamic_slice(K, (0, c0), (N, nb))
        Lrow = jax.lax.dynamic_slice(L, (c0, 0), (nb, N))
        Acols = Kcols - L @ Lrow.T                    # (N, nb)
        panel = jax.lax.dynamic_slice(Acols, (c0, 0), (nb, nb))
        Lkk, Minv = _panel_chol_and_inv(panel)
        below = Acols @ Minv.T                        # (N, nb)
        # zero at and above the panel; then write Lkk into the diagonal
        mask = (rows >= c0 + nb)[:, None]
        cols_new = jnp.where(mask, below, 0.0)
        cols_new = jax.lax.dynamic_update_slice(cols_new, Lkk, (c0, 0))
        L = jax.lax.dynamic_update_slice(L, cols_new, (0, c0))
        invs = jax.lax.dynamic_update_slice(
            invs, Minv[None], (k, 0, 0))
        return L, invs

    L, invs = jax.lax.fori_loop(0, np_, body, (L, invs))
    return L, invs


@partial(jax.jit, static_argnames=("nb",))
def blocked_chol_solve(L, invs, b, nb: int = 220):
    """Solve (L L^T) x = b via blocked forward/back substitution using
    the stored panel inverses (pure matmuls, static shapes)."""
    N = L.shape[0]
    np_ = N // nb

    # forward: L y = b
    def fwd_body(k, y):
        c0 = k * nb
        Lrow = jax.lax.dynamic_slice(L, (c0, 0), (nb, N))   # (nb, N)
        bk = jax.lax.dynamic_slice(b, (c0,), (nb,))
        rhs = bk - Lrow @ y
        yk = jax.lax.dynamic_slice(invs, (k, 0, 0), (1, nb, nb))[0] @ rhs
        return jax.lax.dynamic_update_slice(y, yk, (c0,))

    y = jax.lax.fori_loop(0, np_, fwd_body, jnp.zeros_like(b))

    # backward: L^T x = y
    def bwd_body(i, x):
        k = np_ - 1 - i
        c0 = k * nb
        Lcol = jax.lax.dynamic_slice(L, (0, c0), (N, nb))   # (N, nb)
        yk = jax.lax.dynamic_slice(y, (c0,), (nb,))
        rhs = yk - Lcol.T @ x
        Minv = jax.lax.dynamic_slice(invs, (k, 0, 0), (1, nb, nb))[0]
        xk = Minv.T @ rhs
        return jax.lax.dynamic_update_slice(x, xk, (c0,))

    x = jax.lax.fori_loop(0, np_, bwd_body, jnp.zeros_like(b))
    return x


def _pad_to_multiple(K, nb):
    N = K.shape[0]
    Np = -(-N // nb) * nb
    if Np == N:
        return K, N
    Kp = jnp.zeros((Np, Np), dtype=K.dtype)
    Kp = Kp.at[:N, :N].set(K)
    Kp = Kp.at[jnp.arange(N, Np), jnp.arange(N, Np)].set(1.0)
    return Kp, N


class DeviceCholesky:
    """Host facade: factor once, solve many — the on-TPU f64 direct
    solver (equilibrated SPD systems; cond up to ~1/eps_f64)."""

    def __init__(self, nb: int = 220):
        self.nb = nb
        self._L = None
        self._invs = None
        self._dscale = None
        self._N = None

    def factor(self, K):
        dsc = jax.lax.rsqrt(jnp.abs(jnp.diagonal(K)) + 1e-300)
        Keq = K * dsc[:, None] * dsc[None, :]
        Kp, N = _pad_to_multiple(Keq, self.nb)
        self._L, self._invs = blocked_cholesky(Kp, nb=self.nb)
        self._dscale = dsc
        self._N = N
        return self

    def solve(self, b):
        bn = (self._dscale * b.reshape(-1))
        Np = self._L.shape[0]
        if Np != self._N:
            bn = jnp.concatenate(
                [bn, jnp.zeros(Np - self._N, dtype=bn.dtype)])
        y = blocked_chol_solve(self._L, self._invs, bn, nb=self.nb)
        return (self._dscale * y[: self._N]).reshape(b.shape)