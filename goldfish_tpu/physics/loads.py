"""Load models: dead areal loads, point loads, follower pressure.

Replaces the reference's UFL source terms + FEniCS PointSource
(reference: GOLDFISH/tests/test_slr.py:134-138 source terms,
test_tbeam.py:113-119 PointSource) and the aero linear-spline pressure
coupling (reference: GOLDFISH/nonmatching_opt.py:1582-1665).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from goldfish_tpu.geometry.nurbs import NURBS
from goldfish_tpu.geometry.patch_stack import PatchStack
from goldfish_tpu.ops.bspline import rational_basis_2d
from goldfish_tpu.physics.kl_shell import external_work_dead_load, surface_fields

__all__ = ["PointLoads", "build_point_loads", "external_work",
           "follower_pressure_work"]


class PointLoads(NamedTuple):
    """Stacked point loads: F . u(xi) at fixed parametric points."""

    patch: jnp.ndarray  # (n,) int32
    conn: jnp.ndarray   # (n, L) int32
    R0: jnp.ndarray     # (n, L)
    F: jnp.ndarray      # (n, 3)


def build_point_loads(surfs: list[NURBS], entries, max_loc: int,
                      dtype=jnp.float64) -> PointLoads | None:
    """entries: list of (patch_index, xi (2,), force (3,))."""
    if not entries:
        return None
    patch, conns, R0s, Fs = [], [], [], []
    for (ip, xi, F) in entries:
        s = surfs[ip]
        p, q = s.degree
        conn, tab = rational_basis_2d(
            s.knots[0], s.knots[1], p, q, s.weights,
            np.asarray(xi, dtype=np.float64)[None, :], nd=0)
        c = np.zeros(max_loc, dtype=np.int64)
        r = np.zeros(max_loc)
        c[: conn.shape[1]] = conn[0]
        r[: conn.shape[1]] = tab[(0, 0)][0]
        patch.append(ip)
        conns.append(c)
        R0s.append(r)
        Fs.append(np.asarray(F, dtype=np.float64))
    return PointLoads(
        patch=jnp.asarray(patch, dtype=jnp.int32),
        conn=jnp.asarray(np.stack(conns), dtype=jnp.int32),
        R0=jnp.asarray(np.stack(R0s), dtype=dtype),
        F=jnp.asarray(np.stack(Fs), dtype=dtype),
    )


def point_load_work(pl: PointLoads, d):
    """sum_i F_i . u(xi_i)."""
    dp = d[pl.patch]  # (n, C, 3)
    de = jax.vmap(lambda c, idx: c[idx])(dp, pl.conn)  # (n, L, 3)
    u = jnp.einsum("nl,nlk->nk", pl.R0, de)
    return jnp.sum(pl.F * u)


def follower_pressure_work(stack: PatchStack, d, cp, pressure):
    """Work of a uniform follower (normal) pressure per patch.

    Exact potential for constant p: W = p/3 int x . (x_,u X x_,v) dxi
    (volume-swept form). pressure: (P,) outward-normal magnitude.
    """
    X = surface_fields(stack, cp)
    u = surface_fields(stack, d)
    x = X["v"] + u["v"]
    xu = X["du"] + u["du"]
    xv = X["dv"] + u["dv"]
    X0 = X["v"]
    vol_cur = jnp.sum(x * jnp.cross(xu, xv), -1)
    vol_ref = jnp.sum(X0 * jnp.cross(X["du"], X["dv"]), -1)
    dens = (vol_cur - vol_ref) / 3.0
    return jnp.sum(pressure[:, None, None] * dens * stack.wq)


def external_work(stack: PatchStack, d, cp, f_areal=None, point_loads=None,
                  pressure=None):
    W = jnp.zeros(())
    if f_areal is not None:
        W = W + external_work_dead_load(stack, d, cp, f_areal)
    if point_loads is not None:
        W = W + point_load_work(point_loads, d)
    if pressure is not None:
        W = W + follower_pressure_work(stack, d, cp, pressure)
    return W
