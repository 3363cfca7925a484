"""Penalty coupling of non-matching patches at interface quadrature points.

TPU-native replacement for the reference's mortar-mesh machinery
(PENGoLINS `NonMatchingCoupling.mortar_meshes_setup`, transfer matrices,
`Rm_list`/`dRm_dum_list`; reference: GOLDFISH/nonmatching_opt.py:404-420,
589-623, 1042-1341): instead of building FEniCS mortar meshes and
interpolation matrices, both patches' rational bases are evaluated
directly at shared interface quadrature points (that evaluation IS the
transfer matrix), and the displacement + rotational continuity penalties
of Herrema et al., CMAME 2019 (the formulation PENGoLINS implements)
become one more differentiable energy term:

  W_pen = sum_qp w dl [ alpha_d/2 |u_A - u_B|^2
        + alpha_r/2 ((a3A.a3B - A3A.A3B)^2 + (a3A.anB - A3A.AnB)^2) ]

with an = a3 x t_hat the interface conormal. All xi-derivatives the
reference hand-derives (dRIGAdxi, reference:
GOLDFISH/nonmatching_opt.py:1042-1341) are JAX AD through this function
in the moving-intersection path.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from goldfish_tpu.geometry.nurbs import NURBS
from goldfish_tpu.ops.bspline import rational_basis_2d
from goldfish_tpu.ops.quadrature import gauss_points_1d

__all__ = ["InterfaceStack", "InterfaceSpec", "build_interfaces",
           "spec_polylines", "polyline_interp",
           "penalty_energy", "interface_hessians"]


class InterfaceSpec(NamedTuple):
    """Host-side description of one patch-patch intersection.

    Straight parametric segments are given by their endpoints
    (xi_ends_*); GENERAL CURVED intersection curves carry full
    parametric polylines (xi_pts_*, the reference's
    `intersections_para_coords` format; reference:
    GOLDFISH/cpiga2xi.py:43-57). When polylines are present they take
    precedence and the endpoints are derived from them."""

    pair: tuple  # (patch_A, patch_B)
    xi_ends_A: np.ndarray  # (2, 2) segment endpoints in A's parametric space
    xi_ends_B: np.ndarray  # (2, 2)
    n_mortar_el: int       # quadrature resolution along the interface
    xi_pts_A: np.ndarray | None = None  # (m, 2) parametric polyline
    xi_pts_B: np.ndarray | None = None  # (m, 2)


def spec_polylines(spec: InterfaceSpec):
    """(ptsA, ptsB) polylines of a spec (2-point for straight segs)."""
    if spec.xi_pts_A is not None:
        return (np.asarray(spec.xi_pts_A, dtype=np.float64),
                np.asarray(spec.xi_pts_B, dtype=np.float64))
    return (np.asarray(spec.xi_ends_A, dtype=np.float64),
            np.asarray(spec.xi_ends_B, dtype=np.float64))


def polyline_interp(pts: np.ndarray, s: np.ndarray):
    """Piecewise-linear interpolation of a (m, 2) polyline at curve
    parameter s in [0, 1] (uniform per segment). Returns (xi, dxi/ds)."""
    m = pts.shape[0]
    if m == 2:
        xi = (1 - s)[:, None] * pts[0] + s[:, None] * pts[1]
        dxi = np.broadcast_to(pts[1] - pts[0], xi.shape)
        return xi, np.array(dxi)
    t = s * (m - 1)
    j = np.clip(np.floor(t).astype(int), 0, m - 2)
    f = (t - j)[:, None]
    xi = (1 - f) * pts[j] + f * pts[j + 1]
    dxi = (pts[j + 1] - pts[j]) * (m - 1)
    return xi, dxi


class InterfaceStack(NamedTuple):
    """Padded device arrays; I = interfaces, N = max qps, L = max local."""

    pairA: jnp.ndarray  # (I,) int32
    pairB: jnp.ndarray
    connA: jnp.ndarray  # (I, N, L) int32
    connB: jnp.ndarray
    RA00: jnp.ndarray   # (I, N, L)
    RA10: jnp.ndarray
    RA01: jnp.ndarray
    RB00: jnp.ndarray
    RB10: jnp.ndarray
    RB01: jnp.ndarray
    w: jnp.ndarray      # (I, N) quadrature weights in s (0 on padding)
    dxiA: jnp.ndarray   # (I, N, 2) d xi_A / ds
    dxiB: jnp.ndarray
    ad_scale: jnp.ndarray  # (I,) penalty_coefficient / h_m  (alpha_d / (E h))
    ar_scale: jnp.ndarray  # (I,)    "       (alpha_r * 12 / (E h^3))

    @property
    def n_interfaces(self):
        return self.pairA.shape[0]


def _segment_quadrature(n_el: int, nq: int = 2):
    """Gauss points/weights on [0,1] split into n_el elements."""
    g, wg = gauss_points_1d(nq)
    edges = np.linspace(0.0, 1.0, n_el + 1)
    s = []
    w = []
    for a, b in zip(edges[:-1], edges[1:]):
        s.append(0.5 * (a + b) + 0.5 * (b - a) * g)
        w.append(0.5 * (b - a) * wg)
    return np.concatenate(s), np.concatenate(w)


def build_interfaces(
    surfs: list[NURBS],
    specs: list[InterfaceSpec],
    penalty_coefficient: float = 1.0e3,
    nq_per_el: int = 2,
    dtype=jnp.float64,
) -> InterfaceStack | None:
    """Precompute interface quadrature + both sides' basis tables.

    Penalty scales follow the reference's convention (Herrema et al.;
    penalty_coefficient ~ 1e3, reference: GOLDFISH/tests/test_slr.py:58):
    alpha_d = c E h / h_m, alpha_r = c E h^3 / (12 h_m) with h_m the
    mortar element size; E, h are evaluated on the fly at the interface
    so thickness optimization stays differentiable.
    """
    if not specs:
        return None
    per = []
    for spec in specs:
        iA, iB = spec.pair
        sA, sB = surfs[iA], surfs[iB]
        s, w = _segment_quadrature(spec.n_mortar_el, nq_per_el)
        plA, plB = spec_polylines(spec)
        xiA, dxiA = polyline_interp(plA, s)
        xiB, dxiB = polyline_interp(plB, s)

        pA, qA = sA.degree
        pB, qB = sB.degree
        connA, tabA = rational_basis_2d(
            sA.knots[0], sA.knots[1], pA, qA, sA.weights, xiA, nd=1)
        connB, tabB = rational_basis_2d(
            sB.knots[0], sB.knots[1], pB, qB, sB.weights, xiB, nd=1)

        # physical interface length on reference geometry of side A
        PA = sA.points.reshape(-1, 3)
        Xu = np.einsum("nl,nlk->nk", tabA[(1, 0)], PA[connA])
        Xv = np.einsum("nl,nlk->nk", tabA[(0, 1)], PA[connA])
        dXds = Xu * dxiA[:, :1] + Xv * dxiA[:, 1:]
        length = float(np.sum(np.linalg.norm(dXds, axis=-1) * w))
        h_m = length / spec.n_mortar_el

        per.append(dict(
            iA=iA, iB=iB, connA=connA, connB=connB,
            RA=tabA, RB=tabB, w=w, dxiA=dxiA, dxiB=dxiB,
            ad=penalty_coefficient / h_m,
            ar=penalty_coefficient / h_m,
        ))

    N = max(p["w"].shape[0] for p in per)
    L = max(max(p["connA"].shape[1], p["connB"].shape[1]) for p in per)

    def padN(a, n_target, axis=0, mode="zero"):
        """Pad axis to n_target; 'repeat' replicates entry 0 (padding
        discipline: padded interface qps evaluate real geometry with
        zero weight, so no 0/0 -> NaN in unit normals)."""
        k = n_target - a.shape[axis]
        if k <= 0:
            return a
        if mode == "repeat":
            filler = np.repeat(np.take(a, [0], axis=axis), k, axis=axis)
            return np.concatenate([a, filler], axis=axis)
        pad = [(0, 0)] * a.ndim
        pad[axis] = (0, k)
        return np.pad(a, pad)

    def pack(key, tab_key=None):
        outs = []
        for p in per:
            a = p[key] if tab_key is None else p[key][tab_key]
            a = padN(a, L, axis=1)                  # local pad: zeros
            a = padN(a, N, axis=0, mode="repeat")   # qp pad: replicate
            outs.append(a)
        return np.stack(outs)

    w = np.stack([padN(p["w"], N) for p in per])  # zero weights on padding
    dxiA = np.stack([padN(p["dxiA"], N, mode="repeat") for p in per])
    dxiB = np.stack([padN(p["dxiB"], N, mode="repeat") for p in per])

    return InterfaceStack(
        pairA=jnp.asarray([p["iA"] for p in per], dtype=jnp.int32),
        pairB=jnp.asarray([p["iB"] for p in per], dtype=jnp.int32),
        connA=jnp.asarray(pack("connA"), dtype=jnp.int32),
        connB=jnp.asarray(pack("connB"), dtype=jnp.int32),
        RA00=jnp.asarray(pack("RA", (0, 0)), dtype=dtype),
        RA10=jnp.asarray(pack("RA", (1, 0)), dtype=dtype),
        RA01=jnp.asarray(pack("RA", (0, 1)), dtype=dtype),
        RB00=jnp.asarray(pack("RB", (0, 0)), dtype=dtype),
        RB10=jnp.asarray(pack("RB", (1, 0)), dtype=dtype),
        RB01=jnp.asarray(pack("RB", (0, 1)), dtype=dtype),
        w=jnp.asarray(w, dtype=dtype),
        dxiA=jnp.asarray(dxiA, dtype=dtype),
        dxiB=jnp.asarray(dxiB, dtype=dtype),
        ad_scale=jnp.asarray([p["ad"] for p in per], dtype=dtype),
        ar_scale=jnp.asarray([p["ar"] for p in per], dtype=dtype),
    )


def _unit(v):
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


def qp_penalty_density(RA3, RB3, dxiA, dxiB, deA, deB, peA, peB,
                       heA, heB, E_int, ad_scale, ar_scale):
    """Penalty energy density (incl. line measure dl) at ONE interface qp.

    RA3/RB3: 3-tuples of (L,) basis rows (value, d/du, d/dv);
    deA/deB/peA/peB: (L, 3) local displacement / control points;
    heA/heB: (L,) local thickness coefficients. Everything batcheable.
    """
    RA0, RA1u, RA1v = RA3
    RB0, RB1u, RB1v = RB3
    ev = lambda R, c: jnp.einsum("...l,...lk->...k", R, c)

    XA, XAu, XAv = ev(RA0, peA), ev(RA1u, peA), ev(RA1v, peA)
    XB, XBu, XBv = ev(RB0, peB), ev(RB1u, peB), ev(RB1v, peB)
    uA, uAu, uAv = ev(RA0, deA), ev(RA1u, deA), ev(RA1v, deA)
    uB, uBu, uBv = ev(RB0, deB), ev(RB1u, deB), ev(RB1v, deB)
    hA = jnp.einsum("...l,...l->...", RA0, heA)
    hB = jnp.einsum("...l,...l->...", RB0, heB)
    h_int = 0.5 * (hA + hB)

    dXds = XAu * dxiA[..., :1] + XAv * dxiA[..., 1:]
    dl = jnp.linalg.norm(dXds, axis=-1)

    A3A = _unit(jnp.cross(XAu, XAv))
    A3B = _unit(jnp.cross(XBu, XBv))
    a3A = _unit(jnp.cross(XAu + uAu, XAv + uAv))
    a3B = _unit(jnp.cross(XBu + uBu, XBv + uBv))

    TB = _unit(XBu * dxiB[..., :1] + XBv * dxiB[..., 1:])
    tB = _unit((XBu + uBu) * dxiB[..., :1] + (XBv + uBv) * dxiB[..., 1:])
    AnB = jnp.cross(A3B, TB)
    anB = jnp.cross(a3B, tB)

    dphi = jnp.sum(a3A * a3B, -1) - jnp.sum(A3A * A3B, -1)
    dbeta = jnp.sum(a3A * anB, -1) - jnp.sum(A3A * AnB, -1)
    du2 = jnp.sum((uA - uB) ** 2, -1)

    alpha_d = ad_scale * E_int * h_int
    alpha_r = ar_scale * E_int * h_int**3 / 12.0
    dens = 0.5 * alpha_d * du2 + 0.5 * alpha_r * (dphi**2 + dbeta**2)
    return dens * dl


def _gather_sides(ifs: InterfaceStack, coefs):
    """coefs: (P, C, k) -> per-qp local (I, N, L, k) for both sides."""
    cA = coefs[ifs.pairA]
    cB = coefs[ifs.pairB]
    g = jax.vmap(lambda c, idx: c[idx])
    return g(cA, ifs.connA), g(cB, ifs.connB)


def penalty_energy(ifs: InterfaceStack | None, d, cp, h_coef, E, nu=None):
    """Total coupling penalty energy (scalar).

    d, cp: (P, C, 3); h_coef: (P, C); E: (P,)."""
    if ifs is None or ifs.n_interfaces == 0:
        return jnp.zeros(())
    deA, deB = _gather_sides(ifs, d)
    peA, peB = _gather_sides(ifs, cp)
    heA, heB = _gather_sides(ifs, h_coef[..., None])
    E_int = jnp.maximum(E[ifs.pairA], E[ifs.pairB])[:, None]
    dens = qp_penalty_density(
        (ifs.RA00, ifs.RA10, ifs.RA01), (ifs.RB00, ifs.RB10, ifs.RB01),
        ifs.dxiA, ifs.dxiB, deA, deB, peA, peB,
        heA[..., 0], heB[..., 0], E_int,
        ifs.ad_scale[:, None], ifs.ar_scale[:, None])
    return jnp.sum(dens * ifs.w)


def _interface_hessians_ref(ifs: InterfaceStack, d, cp, h_coef, E):
    """Reference implementation: vmapped jax.hessian over the 6L local
    dofs (kept as the oracle for interface_hessians tests)."""
    deA, deB = _gather_sides(ifs, d)
    peA, peB = _gather_sides(ifs, cp)
    heA, heB = _gather_sides(ifs, h_coef[..., None])
    E_int = jnp.maximum(E[ifs.pairA], E[ifs.pairB])

    L = ifs.RA00.shape[-1]

    def qp(RA0, RA1u, RA1v, RB0, RB1u, RB1v, dxa, dxb,
           dea, deb, pea, peb, hea, heb, Ei, ads, ars, wq):
        def f(x):
            da = x[: 3 * L].reshape(L, 3)
            db = x[3 * L:].reshape(L, 3)
            return wq * qp_penalty_density(
                (RA0, RA1u, RA1v), (RB0, RB1u, RB1v), dxa, dxb,
                da, db, pea, peb, hea, heb, Ei, ads, ars)
        x0 = jnp.concatenate([dea.reshape(-1), deb.reshape(-1)])
        return jax.hessian(f)(x0)

    vqp = jax.vmap(jax.vmap(
        qp, in_axes=(0,) * 14 + (None,) * 3 + (0,)),
        in_axes=(0,) * 18)
    return vqp(ifs.RA00, ifs.RA10, ifs.RA01, ifs.RB00, ifs.RB10, ifs.RB01,
               ifs.dxiA, ifs.dxiB, deA, deB, peA, peB,
               heA[..., 0], heB[..., 0], E_int,
               ifs.ad_scale, ifs.ar_scale, ifs.w)


def interface_hessians(ifs: InterfaceStack, d, cp, h_coef, E):
    """Exact per-qp coupling stiffness blocks.

    Returns (I, N, 6L, 6L): Hessian of (w * density) wrt the stacked
    local vector [deA.ravel(), deB.ravel()].

    Jet formulation (same trick as kl_shell.element_hessians): the
    density depends on d only through the 18 scalars
    z = (uA, uAu, uAv, uB, uBu, uBv), so each qp block is B^T H B with
    H the 18x18 jet Hessian and B built from the stored basis rows.
    """
    deA, deB = _gather_sides(ifs, d)
    peA, peB = _gather_sides(ifs, cp)
    heA, heB = _gather_sides(ifs, h_coef[..., None])
    E_int = jnp.maximum(E[ifs.pairA], E[ifs.pairB])
    I_, N = ifs.w.shape
    L = ifs.RA00.shape[-1]

    ev = lambda R, c: jnp.einsum("inl,inlk->ink", R, c)
    zA = jnp.stack([ev(ifs.RA00, deA), ev(ifs.RA10, deA),
                    ev(ifs.RA01, deA)], axis=-2)        # (I, N, 3, 3)
    zB = jnp.stack([ev(ifs.RB00, deB), ev(ifs.RB10, deB),
                    ev(ifs.RB01, deB)], axis=-2)
    XA = jnp.stack([ev(ifs.RA00, peA), ev(ifs.RA10, peA),
                    ev(ifs.RA01, peA)], axis=-2)
    XB = jnp.stack([ev(ifs.RB00, peB), ev(ifs.RB10, peB),
                    ev(ifs.RB01, peB)], axis=-2)
    hqA = jnp.einsum("inl,inl->in", ifs.RA00, heA[..., 0])
    hqB = jnp.einsum("inl,inl->in", ifs.RB00, heB[..., 0])

    def qp_val(zflat, Xa, Xb, dxa, dxb, ha, hb, Ei, ads, ars, wq):
        z = zflat.reshape(6, 3)
        # identity basis rows: the "locals" ARE the jet values; the
        # density reads them through ev(R, c) with R = eye rows
        one = jnp.ones((), dtype=zflat.dtype)
        zero = jnp.zeros((), dtype=zflat.dtype)
        # emulate qp_penalty_density on jets directly (L_jet = 3 with
        # rows selecting value/d_u/d_v)
        eyeA = jnp.eye(3, dtype=zflat.dtype)
        dens = qp_penalty_density(
            (eyeA[0], eyeA[1], eyeA[2]), (eyeA[0], eyeA[1], eyeA[2]),
            dxa, dxb, z[:3], z[3:], Xa, Xb,
            jnp.array([ha, zero * one, zero], dtype=zflat.dtype),
            jnp.array([hb, zero, zero], dtype=zflat.dtype),
            Ei, ads, ars)
        return wq * dens

    hess = jax.hessian(qp_val)
    v = jax.vmap(jax.vmap(
        hess, in_axes=(0,) * 7 + (None,) * 3 + (0,)),
        in_axes=(0,) * 11)
    H = v(jnp.concatenate([zA, zB], axis=-2).reshape(I_, N, 18),
          XA, XB, ifs.dxiA, ifs.dxiB, hqA, hqB, E_int,
          ifs.ad_scale, ifs.ar_scale, ifs.w)
    H = H.reshape(I_, N, 6, 3, 6, 3)

    RsA = jnp.stack([ifs.RA00, ifs.RA10, ifs.RA01], axis=-2)  # (I,N,3,L)
    RsB = jnp.stack([ifs.RB00, ifs.RB10, ifs.RB01], axis=-2)
    Rs = jnp.concatenate([
        jnp.concatenate([RsA, jnp.zeros_like(RsA)], axis=-1),
        jnp.concatenate([jnp.zeros_like(RsB), RsB], axis=-1),
    ], axis=-2)                                          # (I, N, 6, 2L)
    tmp = jnp.einsum("injxky,inkm->injxmy", H, Rs)
    Ki = jnp.einsum("injxmy,injl->inlxmy", tmp, Rs)
    return Ki.reshape(I_, N, 6 * L, 6 * L)
