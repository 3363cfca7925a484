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


def _skewed_tbeam(skew_side, num_el=4, p=3, n_pts=13):
    """T-beam where one side of the seam has a strongly non-uniform
    (cubically clustered) knot vector — the round-2 verdict's untested
    configuration for the side-A-only spacing rows (weak #8): the
    spacing residual is a GAUGE choice (uniform side-A physical
    spacing), valid for any side-B parametrization; this exercises a
    heavy skew on either side."""
    import numpy as np

    from goldfish_tpu.geometry.cadkit import line, ruled
    from goldfish_tpu.models import tbeam
    from goldfish_tpu.physics.coupling import InterfaceSpec
    from goldfish_tpu.solver.system_mi import MINonMatchingSystem

    def surf(pts, ne0, ne1, p, skew):
        s = ruled(line(pts[0], pts[1]), line(pts[2], pts[3]))
        p0, p1 = s.degree
        s = s.elevate(0, p - p0).elevate(1, p - p1)
        k0 = np.linspace(0, 1, ne0 + 1)[1:-1]
        k1 = np.linspace(0, 1, ne1 + 1)[1:-1]
        if skew:  # cubic clustering toward the root
            k1 = k1 ** 3
        return s.refine(0, k0).refine(1, k1)

    w2 = tbeam.WIDTH / 2
    pts0 = [[-w2, 0, 0], [w2, 0, 0], [-w2, tbeam.LENGTH, 0],
            [w2, tbeam.LENGTH, 0]]
    pts1 = [[0, 0, 0], [0, 0, -tbeam.DEPTH], [0, tbeam.LENGTH, 0],
            [0, tbeam.LENGTH, -tbeam.DEPTH]]
    srf0 = surf(pts0, 2, num_el, p, skew=(skew_side == "A"))
    srf1 = surf(pts1, 2, num_el + 1, p, skew=(skew_side == "B"))
    specs = [InterfaceSpec(
        pair=(0, 1),
        xi_ends_A=np.array([[0.5, 0.0], [0.5, 1.0]]),
        xi_ends_B=np.array([[0.0, 0.0], [0.0, 1.0]]),
        n_mortar_el=n_pts - 1)]
    sys = MINonMatchingSystem([srf0, srf1], tbeam.E, tbeam.NU,
                              tbeam.H_TH, specs=specs,
                              n_pts_list=[n_pts])
    sys.add_side_bc(0, direction=1, side=0, n_layers=1)
    sys.add_side_bc(1, direction=1, side=0, n_layers=1)
    sys.add_point_load(0, [1.0, 1.0], [0.0, 0.0, 10.0])
    return sys


@pytest.mark.parametrize("skew_side", ["A", "B"])
def test_xi_solve_skewed_parametrization(skew_side):
    """xi solves to the floor and the seam points physically coincide
    under a cubically-clustered knot vector on either side."""
    import jax.numpy as jnp
    import numpy as np

    from goldfish_tpu.ops.bspline_jax import surface_point

    sys = _skewed_tbeam(skew_side)
    c2x = sys.c2x
    xi = c2x.solve(sys.cp)
    assert c2x.residual_norm(sys.cp, xi) < 1e-10

    # physical coincidence of both sides' points
    mi = c2x.mi
    n = int(mi.n_pts[0])
    x = xi.reshape(mi.n_int, mi.n_max, 2, 2)
    ptsA = np.stack([
        np.asarray(surface_point(c2x.ss, c2x.p, c2x.q, mi.pairA[0],
                                 sys.cp, x[0, k, 0])) for k in range(n)])
    ptsB = np.stack([
        np.asarray(surface_point(c2x.ss, c2x.p, c2x.q, mi.pairB[0],
                                 sys.cp, x[0, k, 1])) for k in range(n)])
    assert np.max(np.linalg.norm(ptsA - ptsB, axis=-1)) < 1e-9

    # side-A physical spacing is uniform (the gauge the rows fix)
    seg = np.linalg.norm(np.diff(ptsA, axis=0), axis=-1)
    assert np.max(np.abs(seg - seg.mean())) / seg.mean() < 1e-6


@pytest.mark.parametrize("skew_side", ["A", "B"])
def test_full_chain_gradient_skewed(skew_side):
    """CP -> xi -> d -> J gradient vs FD with the skewed knot vector
    (the configuration weak #8 flagged as untested)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from goldfish_tpu.physics import kl_shell

    sys = _skewed_tbeam(skew_side, num_el=3, p=2, n_pts=9)
    forward = sys.build_forward(rtol=1e-11, max_it=25)
    d0 = sys.zero_displacement()
    m = sys.metas[1]
    gv = sys.surfs[1].greville_points(1)
    bend = jnp.asarray(np.tile(np.sin(np.pi * np.asarray(gv))[None, :],
                               (m.n_u, 1)).ravel())

    def J(amp):
        cp = sys.cp.at[1, : m.n_cp, 0].add(amp * bend)
        d, xi = forward(cp, sys.h_init, d0)
        return kl_shell.internal_energy(sys.stack, d, cp, sys.h_init,
                                        sys.E, sys.nu)

    amp0 = jnp.asarray(0.05)
    g = float(jax.grad(J)(amp0))
    eps = 1e-5
    fd = float((J(amp0 + eps) - J(amp0 - eps)) / (2 * eps))
    assert abs(g - fd) / abs(fd) < 1e-5, (g, fd)
