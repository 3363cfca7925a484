"""JAX-traceable NURBS surface evaluation at arbitrary parametric points.

The moving-intersection path needs surface values S(xi) with xi a TRACED
variable (the reference calls OpenCASCADE `D0/D1` point-by-point on the
host, GOLDFISH/cpiga2xi.py:346-375; and hand-derives every
xi-derivative). Here the Cox-de-Boor value recursion itself is traced
(degrees are static, loops unroll), so ALL xi-derivatives — dS/dxi for
the intersection residual, d(penalty)/dxi for the coupling — come from
jax.jacfwd/jvp through this evaluator. The knot-span search lowers to a
searchsorted over precomputed non-empty spans (piecewise-constant in xi,
zero derivative, as it should be).

Batching: patches are packed into a `SurfSet` with knot vectors padded
by end-knot repeats and valid-span tables padded with +inf sentinels,
so evaluation vmaps over (patch index, point) with static shapes. All
packed surfaces must share polynomial degree (typical: cubic).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

__all__ = ["SurfSet", "make_surf_set", "surface_basis", "surface_point",
           "field_at"]


class SurfSet(NamedTuple):
    """Padded per-patch NURBS data for traced evaluation. P patches,
    C max control points (matching PatchStack layout i_u * n_v + i_v)."""

    knots_u: jnp.ndarray      # (P, Ku)
    knots_v: jnp.ndarray      # (P, Kv)
    span_u_vals: jnp.ndarray  # (P, Su) start knot of each valid span; +inf pad
    span_u_ids: jnp.ndarray   # (P, Su) int32
    span_v_vals: jnp.ndarray  # (P, Sv)
    span_v_ids: jnp.ndarray   # (P, Sv) int32
    w: jnp.ndarray            # (P, C) weights (1.0 on padding)
    n_v: jnp.ndarray          # (P,) int32


def make_surf_set(surfs, max_cp: int | None = None, dtype=jnp.float64):
    """Pack NURBS patches (all of equal degree) into a SurfSet.

    Returns (surf_set, (p, q)).
    """
    degs = {s.degree for s in surfs}
    assert len(degs) == 1, f"mixed degrees not supported in SurfSet: {degs}"
    p, q = degs.pop()
    max_cp = max_cp or max(s.shape[0] * s.shape[1] for s in surfs)

    def pad_knots(ks):
        m = max(len(k) for k in ks)
        return np.stack([
            np.concatenate([k, np.full(m - len(k), k[-1])]) for k in ks])

    def spans(ks, deg):
        per_vals, per_ids = [], []
        for k in ks:
            ids = [i for i in range(deg, len(k) - deg - 1) if k[i + 1] > k[i]]
            per_ids.append(ids)
            per_vals.append([k[i] for i in ids])
        m = max(len(v) for v in per_vals)
        vals = np.full((len(ks), m), np.inf)
        idsa = np.zeros((len(ks), m), dtype=np.int32)
        for r, (v, i) in enumerate(zip(per_vals, per_ids)):
            vals[r, : len(v)] = v
            idsa[r, : len(i)] = i
            idsa[r, len(i):] = i[-1]
        return vals, idsa

    ku = [s.knots[0] for s in surfs]
    kv = [s.knots[1] for s in surfs]
    su_vals, su_ids = spans(ku, p)
    sv_vals, sv_ids = spans(kv, q)
    w = np.ones((len(surfs), max_cp))
    for i, s in enumerate(surfs):
        wi = s.weights.reshape(-1)
        w[i, : wi.size] = wi

    ss = SurfSet(
        knots_u=jnp.asarray(pad_knots(ku), dtype=dtype),
        knots_v=jnp.asarray(pad_knots(kv), dtype=dtype),
        span_u_vals=jnp.asarray(su_vals, dtype=dtype),
        span_u_ids=jnp.asarray(su_ids),
        span_v_vals=jnp.asarray(sv_vals, dtype=dtype),
        span_v_ids=jnp.asarray(sv_ids),
        w=jnp.asarray(w, dtype=dtype),
        n_v=jnp.asarray([s.shape[1] for s in surfs], dtype=jnp.int32),
    )
    return ss, (p, q)


def _find_span(span_vals, span_ids, u):
    k = jnp.searchsorted(span_vals, u, side="right") - 1
    k = jnp.clip(k, 0, span_vals.shape[0] - 1)
    return span_ids[k]


def _basis_values(knots, p: int, span, u):
    """Nonzero B-spline basis values at u (Piegl & Tiller A2.2),
    degree static -> loops unroll into the jaxpr; traced u
    differentiates cleanly."""
    N = [jnp.ones_like(u)]
    left = [None]
    right = [None]
    for j in range(1, p + 1):
        left.append(u - knots[span + 1 - j])
        right.append(knots[span + j] - u)
        saved = jnp.zeros_like(u)
        N_new = []
        for r in range(j):
            denom = right[r + 1] + left[j - r]
            temp = N[r] / denom
            N_new.append(saved + right[r + 1] * temp)
            saved = left[j - r] * temp
        N_new.append(saved)
        N = N_new
    return jnp.stack(N)  # (p+1,)


def surface_basis(ss: SurfSet, p: int, q: int, ip, xi):
    """Weighted local basis at one point: (conn (L,), wN (L,)) with
    L = (p+1)(q+1); rational value of any coefficient field c is
    (wN @ c[conn]) / sum(wN)."""
    su = _find_span(ss.span_u_vals[ip], ss.span_u_ids[ip], xi[0])
    sv = _find_span(ss.span_v_vals[ip], ss.span_v_ids[ip], xi[1])
    Nu = _basis_values(ss.knots_u[ip], p, su, xi[0])
    Nv = _basis_values(ss.knots_v[ip], q, sv, xi[1])
    iu = su - p + jnp.arange(p + 1, dtype=jnp.int32)
    iv = sv - q + jnp.arange(q + 1, dtype=jnp.int32)
    conn = (iu[:, None] * ss.n_v[ip] + iv[None, :]).reshape(-1)
    N = (Nu[:, None] * Nv[None, :]).reshape(-1)
    return conn, N * ss.w[ip][conn]


def surface_point(ss: SurfSet, p: int, q: int, ip, cp, xi):
    """Physical point S(xi) on patch ip; cp: (P, C, 3) padded CPs."""
    conn, wN = surface_basis(ss, p, q, ip, xi)
    W = jnp.sum(wN)
    return (wN @ cp[ip][conn]) / W


def field_at(ss: SurfSet, p: int, q: int, ip, coef, xi):
    """Rational interpolation of an arbitrary (P, C, k) coefficient
    field at xi on patch ip."""
    conn, wN = surface_basis(ss, p, q, ip, xi)
    W = jnp.sum(wN)
    return (wN @ coef[ip][conn]) / W
