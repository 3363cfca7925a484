"""Moving intersections: the implicit CP -> xi map (reference:
GOLDFISH/cpiga2xi.py + operations/cpiga2xi_imop.py __main__ derivative
checks). A bent web moves the T-beam intersection; the solver must track
it (coincidence to machine precision) and differentiate through it."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from goldfish_tpu.geometry.cpiga2xi import CPIGA2Xi
from goldfish_tpu.models import tbeam
from goldfish_tpu.physics.coupling import InterfaceSpec


@pytest.fixture(scope="module")
def tb_geo():
    sys = tbeam.build(num_el=4, p=3)
    specs = [InterfaceSpec(
        pair=(0, 1),
        xi_ends_A=np.array([[0.5, 0.0], [0.5, 1.0]]),
        xi_ends_B=np.array([[0.0, 0.0], [0.0, 1.0]]),
        n_mortar_el=8)]
    c2x = CPIGA2Xi(sys.surfs, specs, n_pts_list=[11])
    return sys, c2x


def _bent_cp(sys, amp):
    """Shift the web (patch 1) in +x by amp*sin(pi*v) at each CP row."""
    cp = np.asarray(sys.cp).copy()
    m = sys.metas[1]
    gv = sys.surfs[1].greville_points(1)
    xshift = amp * np.sin(np.pi * gv)
    dx = np.tile(xshift[None, :], (m.n_u, 1)).ravel()
    cp[1, : m.n_cp, 0] += dx
    return jnp.asarray(cp)


def test_solve_straight_config(tb_geo):
    sys, c2x = tb_geo
    x = c2x.solve(sys.cp)
    assert c2x.residual_norm(sys.cp, x) < 1e-10
    xi = np.asarray(x).reshape(1, -1, 2, 2)
    n = int(c2x.mi.n_pts[0])
    assert np.allclose(xi[0, :n, 0, 0], 0.5, atol=1e-10)  # flange midline


def test_solve_bent_web(tb_geo):
    sys, c2x = tb_geo
    cp = _bent_cp(sys, 0.08)
    x = c2x.solve(cp)
    assert c2x.residual_norm(cp, x) < 1e-9
    n = int(c2x.mi.n_pts[0])
    xi = np.asarray(x).reshape(1, -1, 2, 2)[0, :n]
    # intersection curve bends toward +x: u_A > 0.5 in the interior
    assert xi[1:-1, 0, 0].min() > 0.5 + 1e-3
    # both sides' physical points coincide
    from goldfish_tpu.ops.bspline_jax import surface_point
    for k in (0, n // 2, n - 1):
        SA = surface_point(c2x.ss, c2x.p, c2x.q, 0, cp,
                           jnp.asarray(xi[k, 0]))
        SB = surface_point(c2x.ss, c2x.p, c2x.q, 1, cp,
                           jnp.asarray(xi[k, 1]))
        assert float(jnp.linalg.norm(SA - SB)) < 1e-9
    # spacing approximately uniform along the curve
    SAs = np.stack([np.asarray(surface_point(
        c2x.ss, c2x.p, c2x.q, 0, cp, jnp.asarray(xi[k, 0])))
        for k in range(n)])
    seg = np.linalg.norm(np.diff(SAs, axis=0), axis=-1)
    assert seg.std() / seg.mean() < 1e-6


def test_implicit_gradient_parity(tb_geo):
    sys, c2x = tb_geo

    def J(amp):
        cp = jnp.asarray(np.asarray(sys.cp)).at[1, : sys.metas[1].n_cp, 0].add(
            amp * jnp.asarray(np.tile(
                np.sin(np.pi * sys.surfs[1].greville_points(1))[None, :],
                (sys.metas[1].n_u, 1)).ravel()))
        x = c2x.solve(cp)
        return jnp.sum(x ** 2)

    g = jax.grad(J)(jnp.asarray(0.05))
    eps = 1e-6
    fd = (J(jnp.asarray(0.05 + eps)) - J(jnp.asarray(0.05 - eps))) / (2 * eps)
    assert abs(float(g - fd)) / abs(float(fd)) < 1e-6, (float(g), float(fd))
