"""Blocked f64 Cholesky ON TPU, built from emulated-f64 matmuls.

XLA:TPU emulates f64 matmul at multi-Tflop/s on v5e but provides NO f64
factorization kernels (`lu_factor`/`cholesky` fail to compile), and
every f32 factorization is meaningless at KL-shell conditioning
(cond ~1e12). This module closes that gap (the MUMPS role; reference:
GOLDFISH/utils/opt_utils.py:156-209 solve_Ax_b): a left-looking blocked
Cholesky where

  - the per-panel trailing update is one full-width f64 matmul
    (N, N) @ (N, nb) — the MXU does the heavy lifting;
  - the nb x nb panel factorization runs over MICRO-panels of size mb:
    an unrolled mb-step column recursion on (mb, mb) arrays (fuses into
    a handful of tiny kernels) plus (nb, mb) matmul updates. The naive
    nb-step recursion on (nb, nb) arrays costs ~0.2 ms of op latency
    PER COLUMN — at N=6600 that alone was ~1 s of the round-1 1.34 s
    factor time;
  - the panel inverse inv(L_panel) is assembled from the micro-diagonal
    inverses by log2(nb/mb) levels of batched block matmuls
    (X21 = -X22 L21 X11), not a column recursion;
  - panel shapes are STATIC (full-height columns masked below the
    panel), so the whole factorization is one fixed-shape fori_loop
    program — no dynamic shapes, no gather/scatter patterns (the ops
    that corrupt on the axon backend; CLAUDE.md).

The factor returns (L, panel_inverses); triangular solves are blocked
substitutions using the stored panel inverses — again pure matmuls.
`blocked_chol_solve_ir` fuses the triangular solves WITH fixed
iterative-refinement sweeps against the original K into one program
(each host-composed sweep costs ~27 ms of axon tunnel latency).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["blocked_cholesky", "blocked_chol_solve",
           "blocked_chol_solve_ir", "DeviceCholesky"]


def _tri_inv_doubling(L, diag_inv, s0: int):
    """inv(L) for block-lower-triangular L whose s0 x s0 diagonal
    blocks are already inverted (diag_inv holds them, embedded as a
    block-diagonal matrix). log2(n/s0) levels of batched matmuls:
    X21 = -X22 @ L21 @ X11 per 2s x 2s diagonal block."""
    n = L.shape[0]
    X = diag_inv
    s = s0
    while s < n:
        npair = n // (2 * s)
        pi = jnp.arange(npair)
        Ld = L.reshape(npair, 2 * s, npair, 2 * s)[pi, :, pi, :]
        Xd = X.reshape(npair, 2 * s, npair, 2 * s)[pi, :, pi, :]
        X21 = -jnp.einsum("bij,bjk,bkl->bil",
                          Xd[:, s:, s:], Ld[:, s:, :s], Xd[:, :s, :s])
        X = X.reshape(npair, 2 * s, npair, 2 * s) \
             .at[pi, s:, pi, :s].set(X21).reshape(n, n)
        s *= 2
    return X


def _micro_chol_inv(A):
    """Cholesky L of an (mb, mb) SPD block AND inv(L): fully UNROLLED
    column recursion with static slices (a short fused chain of tiny
    kernels, mb <= 32); the inverse comes from log-depth doubling off
    the scalar diagonal — NOT an in-loop forward substitution, which
    would double the sequential op chain (the latency bottleneck of
    the whole factorization at ~0.1 ms per tiny op on axon)."""
    mb = A.shape[0]
    L = jnp.zeros_like(A)
    rows = jnp.arange(mb)
    for j in range(mb):
        s = L[:, :j] @ L[j, :j] if j else jnp.zeros_like(A[:, 0])
        djj = A[j, j] - (jnp.dot(L[j, :j], L[j, :j]) if j else 0.0)
        ljj = jnp.sqrt(jnp.maximum(djj, 1e-300))
        col = (A[:, j] - s) / ljj
        col = jnp.where(rows > j, col, 0.0).at[j].set(ljj)
        L = L.at[:, j].set(col)
    # scalar-diagonal inverse, then double up to mb
    diag_inv = jnp.diag(1.0 / jnp.diagonal(L))
    M = _tri_inv_doubling(L, diag_inv, 1)
    return L, M


def _panel_chol_and_inv(A, mb: int):
    """Cholesky L of an (nb, nb) SPD block AND inv(L).

    Micro-blocked left-looking factorization (fori over nb/mb
    micro-panels, each an unrolled _micro_chol_inv + one (nb, mb)
    matmul update), then inv(L) by log-depth block doubling. Requires
    nb = mb * 2**k."""
    nb = A.shape[0]
    n_micro = nb // mb
    assert n_micro * mb == nb and (n_micro & (n_micro - 1)) == 0, (nb, mb)
    rows = jnp.arange(nb)

    def body(k, carry):
        L, Minv = carry
        c0 = k * mb
        Acols = jax.lax.dynamic_slice(A, (0, c0), (nb, mb))
        Lrow = jax.lax.dynamic_slice(L, (c0, 0), (mb, nb))
        cols = Acols - L @ Lrow.T                       # (nb, mb)
        sub = jax.lax.dynamic_slice(cols, (c0, 0), (mb, mb))
        Lm, Mm = _micro_chol_inv(sub)
        below = cols @ Mm.T
        mask = (rows >= c0 + mb)[:, None]
        cols_new = jnp.where(mask, below, 0.0)
        cols_new = jax.lax.dynamic_update_slice(cols_new, Lm, (c0, 0))
        L = jax.lax.dynamic_update_slice(L, cols_new, (0, c0))
        Minv = jax.lax.dynamic_update_slice(Minv, Mm[None], (k, 0, 0))
        return L, Minv

    L, Mm = jax.lax.fori_loop(
        0, n_micro, body,
        (jnp.zeros_like(A), jnp.zeros((n_micro, mb, mb), dtype=A.dtype)))

    # inv(L) by doubling off the block diagonal of micro inverses,
    # then Newton-Schulz polish: the doubling recursion compounds
    # backward error multiplicatively across levels (measured ~1e-7 at
    # nb=256 — at cond ~1e10 tangents that makes one-shot substitution
    # errors O(1) and fixed-sweep IR stops contracting). Each polish
    # step squares the error (eps -> eps^2): two steps restore
    # ~machine-level inverses with pure matmuls.
    nblk = n_micro
    bi = jnp.arange(nblk)
    X0 = jnp.zeros_like(L).reshape(nblk, mb, nblk, mb) \
        .at[bi, :, bi, :].set(Mm).reshape(nb, nb)
    X = _tri_inv_doubling(L, X0, mb)
    eye = jnp.eye(nb, dtype=L.dtype)
    for _ in range(2):
        X = X + X @ (eye - L @ X)
    return L, X


@partial(jax.jit, static_argnames=("nb", "mb"))
def blocked_cholesky_unrolled(K, nb: int = 256, mb: int = 16):
    """Unrolled left-looking blocked Cholesky with STATIC SHRINKING
    shapes: each panel's update slices exactly the (N - c0, c0) block
    of L it needs (the outer loop is a Python loop, so every slice is
    compile-time static). Trailing-update flops drop from the masked
    fori_loop's 2N^3 to the optimal N^3/3 — on axon the full-width
    updates alone cost ~0.7 s at N=6600. One-time compile is longer
    (N/nb distinct matmul shapes); the persistent cache amortizes it.
    Same return contract as `blocked_cholesky`."""
    N = K.shape[0]
    assert N % nb == 0, (N, nb)
    np_ = N // nb
    cols = []
    invs = []
    for k in range(np_):
        c0 = k * nb
        Kcols = K[c0:, c0:c0 + nb]                    # (N - c0, nb)
        if k:
            Lprev = jnp.concatenate([c[c0:] for c in cols], axis=1)
            Acols = Kcols - Lprev @ Lprev[:nb].T
        else:
            Acols = Kcols
        Lkk, Minv = _panel_chol_and_inv(Acols[:nb], mb)
        below = Acols[nb:] @ Minv.T                   # (N - c0 - nb, nb)
        col = jnp.concatenate(
            [jnp.zeros((c0, nb), dtype=K.dtype), Lkk, below], axis=0)
        cols.append(col)
        invs.append(Minv)
    return jnp.concatenate(cols, axis=1), jnp.stack(invs)


@partial(jax.jit, static_argnames=("nb", "mb"))
def blocked_cholesky(K, nb: int = 256, mb: int = 16):
    """K: (N, N) SPD, N divisible by nb, nb = mb * 2**k. Returns
    (L, invs) with L lower-triangular (K = L L^T) and invs:
    (N/nb, nb, nb) the inverses of the diagonal panels."""
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
        Lkk, Minv = _panel_chol_and_inv(panel, mb)
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


def _chol_substitute(L, invs, b, nb: int):
    """Forward+backward blocked substitution (traced body)."""
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

    return jax.lax.fori_loop(0, np_, bwd_body, jnp.zeros_like(b))


def _chol_substitute_multi(L, invs, B, nb: int):
    """Forward+backward blocked substitution for a MULTI-RHS matrix
    B (N, M) (traced body; pure matmuls like _chol_substitute)."""
    N = L.shape[0]
    np_ = N // nb

    def fwd_body(k, Y):
        c0 = k * nb
        Lrow = jax.lax.dynamic_slice(L, (c0, 0), (nb, N))
        Bk = jax.lax.dynamic_slice(B, (c0, 0), (nb, B.shape[1]))
        rhs = Bk - Lrow @ Y
        Yk = jax.lax.dynamic_slice(invs, (k, 0, 0), (1, nb, nb))[0] @ rhs
        return jax.lax.dynamic_update_slice(Y, Yk, (c0, 0))

    Y = jax.lax.fori_loop(0, np_, fwd_body, jnp.zeros_like(B))

    def bwd_body(i, X):
        k = np_ - 1 - i
        c0 = k * nb
        Lcol = jax.lax.dynamic_slice(L, (0, c0), (N, nb))
        Yk = jax.lax.dynamic_slice(Y, (c0, 0), (nb, B.shape[1]))
        rhs = Yk - Lcol.T @ X
        Minv = jax.lax.dynamic_slice(invs, (k, 0, 0), (1, nb, nb))[0]
        Xk = Minv.T @ rhs
        return jax.lax.dynamic_update_slice(X, Xk, (c0, 0))

    return jax.lax.fori_loop(0, np_, bwd_body, jnp.zeros_like(B))


@partial(jax.jit, static_argnames=("nb",))
def blocked_chol_solve(L, invs, b, nb: int = 256):
    """Solve (L L^T) x = b via blocked forward/back substitution using
    the stored panel inverses (pure matmuls, static shapes)."""
    return _chol_substitute(L, invs, b, nb)


@partial(jax.jit, static_argnames=("nb", "n_ir"))
def blocked_chol_solve_ir(L, invs, K, b, nb: int = 256, n_ir: int = 3):
    """Triangular solve + n_ir FIXED iterative-refinement sweeps
    against K, fused into ONE program (matmul-only; each host-composed
    sweep costs a ~27 ms axon tunnel roundtrip otherwise). K may be the
    exact matrix the factor came from, or a NEWER tangent — with an
    exact refinement matvec, stale factors refine fine (round-2
    measurement, scripts/stale_ir_wing.py: dh/h = 1e-3 reaches the
    ~2e-6 floor in 2 sweeps, 1e-2 in 4); the caller's convergence
    certificate / refactor logic guards the pathological cases."""
    x = _chol_substitute(L, invs, b, nb)

    def sweep(_, x):
        r = b - K @ x
        return x + _chol_substitute(L, invs, r, nb)

    return jax.lax.fori_loop(0, n_ir, sweep, x)


def _pad_to_multiple(K, nb):
    N = K.shape[0]
    Np = -(-N // nb) * nb
    if Np == N:
        return K, N
    Kp = jnp.zeros((Np, Np), dtype=K.dtype)
    Kp = Kp.at[:N, :N].set(K)
    Kp = Kp.at[jnp.arange(N, Np), jnp.arange(N, Np)].set(1.0)
    return Kp, N


@partial(jax.jit, static_argnames=("nb", "mb", "unrolled"))
def _equilibrate_pad_factor(K, nb: int, mb: int, unrolled: bool):
    """Equilibration + padding + blocked factorization fused into ONE
    program (the eager composition costs ~7 dispatches of ~27 ms axon
    tunnel latency per refactorization)."""
    dsc = jax.lax.rsqrt(jnp.abs(jnp.diagonal(K)) + 1e-300)
    Keq = K * dsc[:, None] * dsc[None, :]
    Kp, _ = _pad_to_multiple(Keq, nb)
    fac = blocked_cholesky_unrolled if unrolled else blocked_cholesky
    L, invs = fac.__wrapped__(Kp, nb=nb, mb=mb)
    return L, invs, dsc


class DeviceCholesky:
    """Host facade: factor once, solve many — the on-TPU f64 direct
    solver (equilibrated SPD systems; cond up to ~1/eps_f64)."""

    def __init__(self, nb: int = 256, mb: int = 16, unrolled: bool = True):
        self.nb = nb
        self.mb = mb
        self.unrolled = unrolled
        self._L = None
        self._invs = None
        self._dscale = None
        self._N = None

    def factor(self, K):
        self._L, self._invs, self._dscale = _equilibrate_pad_factor(
            K, self.nb, self.mb, self.unrolled)
        self._N = K.shape[0]
        return self

    def _pad_rhs(self, bn):
        Np = self._L.shape[0]
        if Np != self._N:
            bn = jnp.concatenate(
                [bn, jnp.zeros(Np - self._N, dtype=bn.dtype)])
        return bn

    def solve(self, b):
        bn = self._pad_rhs(self._dscale * b.reshape(-1))
        y = blocked_chol_solve(self._L, self._invs, bn, nb=self.nb)
        return (self._dscale * y[: self._N]).reshape(b.shape)

    def solve_ir(self, K, b, n_ir=3):
        """Fused substitution + n_ir refinement sweeps against the
        EQUILIBRATED form of K (which may be fresher than the factor)."""
        Keq = K * self._dscale[:, None] * self._dscale[None, :]
        Kp, _ = _pad_to_multiple(Keq, self.nb)
        bn = self._pad_rhs(self._dscale * b.reshape(-1))
        y = blocked_chol_solve_ir(self._L, self._invs, Kp, bn,
                                  nb=self.nb, n_ir=n_ir)
        return (self._dscale * y[: self._N]).reshape(b.shape)
