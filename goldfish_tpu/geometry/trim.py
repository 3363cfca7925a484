"""Trimmed-surface quadrature: finite-cell style weight masking.

The reference delegates trimmed CAD faces to OpenCASCADE and analyzes
untrimmed B-spline patches only (its IGES corpus carries trivial
type-144 wrappers: `144,<de>,0,0,0;` — see
demos_om/thickness_opt/plate/geometry/plate_geometry.igs). Here trims
are honored natively: quadrature points outside the trimmed region get
ZERO weight (the repo-wide padding discipline — real geometry, zero
weight, so no 0/0 guards and AD stays clean), optionally on a
span-subdivided rule for sharper resolution of cut cells. This is the
classic finite-cell / immersed quadrature treatment: integration error
is O(cell size) along the trim band and is driven down by `subdiv`.

Loops are closed curves in the surface's PARAMETER space (u, v) — NURBS
curves whose x, y coordinates are u, v (IGES type-142 convention) or
plain (M, 2) polygon vertex arrays. Outer loop = material inside;
inner loops = holes.
"""

from __future__ import annotations

import numpy as np

from goldfish_tpu.geometry.nurbs import NURBS

__all__ = [
    "sample_loop",
    "points_in_polygon",
    "trim_mask",
    "apply_trim",
]


def sample_loop(loop, n_per_span: int = 8) -> np.ndarray:
    """Closed (M, 2) parameter-space polygon from a trim loop.

    `loop` is an (M, 2) array (returned as-is), a NURBS curve, or a
    list of NURBS curves forming a closed composite loop. Curves are
    sampled densely (n_per_span points per unique knot span) so the
    polygon chord error is negligible next to the quadrature-band
    error."""
    if isinstance(loop, np.ndarray):
        assert loop.ndim == 2 and loop.shape[1] >= 2
        return np.asarray(loop[:, :2], dtype=np.float64)
    curves = [loop] if isinstance(loop, NURBS) else list(loop)
    pts = []
    for c in curves:
        assert c.dim == 1, "trim loop curves must be 1-parameter"
        k = c.knots[0]
        uniq = np.unique(k)
        us = np.concatenate(
            [np.linspace(a, b, n_per_span, endpoint=False)
             for a, b in zip(uniq[:-1], uniq[1:])]
            + [uniq[-1:]]
        )
        pts.append(c.evaluate(us)[:, :2])
    poly = np.concatenate(pts, axis=0)
    # drop consecutive duplicates (curve joints repeat the endpoint)
    keep = np.ones(len(poly), dtype=bool)
    keep[1:] = np.linalg.norm(np.diff(poly, axis=0), axis=1) > 1e-14
    return poly[keep]


def points_in_polygon(pts: np.ndarray, poly: np.ndarray) -> np.ndarray:
    """Even-odd rule point-in-polygon test, vectorized.

    pts: (N, 2); poly: (M, 2) closed implicitly (last connects to
    first). Returns bool (N,)."""
    pts = np.asarray(pts, dtype=np.float64)
    x, y = pts[:, 0], pts[:, 1]
    x0, y0 = poly[:, 0], poly[:, 1]
    x1, y1 = np.roll(x0, -1), np.roll(y0, -1)
    # edge straddles the horizontal ray through y
    cond = (y0[None, :] > y[:, None]) != (y1[None, :] > y[:, None])
    dy = y1 - y0
    dy = np.where(np.abs(dy) < 1e-300, 1e-300, dy)
    xi = x0[None, :] + (y[:, None] - y0[None, :]) / dy[None, :] * (
        x1 - x0)[None, :]
    crossings = np.sum(cond & (xi > x[:, None]), axis=1)
    return (crossings % 2) == 1


def trim_mask(qpts: np.ndarray, outer=None, inners=()) -> np.ndarray:
    """Float mask over parameter points: 1 inside the trimmed region.

    qpts: (..., 2). outer: loop or None (None = natural domain).
    inners: iterable of hole loops."""
    flat = np.asarray(qpts, dtype=np.float64).reshape(-1, 2)
    mask = np.ones(len(flat), dtype=bool)
    if outer is not None:
        mask &= points_in_polygon(flat, sample_loop(outer))
    for hole in inners or ():
        mask &= ~points_in_polygon(flat, sample_loop(hole))
    return mask.astype(np.float64).reshape(np.asarray(qpts).shape[:-1])


def apply_trim(quad, outer=None, inners=()):
    """Return a copy of a PatchQuadrature with weights zeroed outside
    the trimmed region (finite-cell masking). Basis tables, conn and
    qpts are untouched — padded/voided points keep real geometry with
    zero weight, per the padding discipline."""
    from dataclasses import replace

    m = trim_mask(quad.qpts, outer, inners)
    return replace(quad, wq=quad.wq * m)


def compress_voided(quad):
    """Drop elements whose every quadrature weight was trimmed to zero
    (they contribute nothing), so a subdivided trimmed patch does not
    inflate the stack's max_el padding — and with it every OTHER
    patch's batched tables — by the void fraction."""
    from dataclasses import replace

    keep = np.asarray(quad.wq).any(axis=1)
    if keep.all():
        return quad
    keep[np.argmax(keep)] |= True  # never drop to zero elements
    return replace(
        quad,
        n_el=int(keep.sum()),
        conn=quad.conn[keep],
        wq=quad.wq[keep],
        R={k: v[keep] for k, v in quad.R.items()},
        qpts=quad.qpts[keep],
    )


def support_weights(stack) -> np.ndarray:
    """Total quadrature mass seen by each control point: (P, C) sums
    of |R00| * wq scattered through conn. A ZERO entry means the CP's
    entire basis support was trimmed away — its stiffness row is
    exactly zero and the dof MUST be pinned or the tangent is
    singular (solver/system.py pins them automatically)."""
    R00 = np.abs(np.asarray(stack.R00))          # (P, E, Q, L)
    wq = np.asarray(stack.wq)                    # (P, E, Q)
    conn = np.asarray(stack.conn)                # (P, E, L)
    mass = np.einsum("peql,peq->pel", R00, wq)
    P, C = conn.shape[0], stack.cp_mask.shape[1]
    out = np.zeros((P, C))
    for p in range(P):
        np.add.at(out[p], conn[p].ravel(), mass[p].ravel())
    return out
