"""Shell-shell contact: two stacked plates pressed together.

The upper cantilever plate is pushed down onto a lower one; with the
contact potential enabled the gap saturates near the interaction
cutoff instead of interpenetrating (the reference gets this from
ShNAPr's ShellContactContext hooked into assemble_RFE)."""

import jax
import jax.numpy as jnp
import numpy as np

from goldfish_tpu.geometry.cadkit import bilinear
from goldfish_tpu.solver.system import NonMatchingSystem


def _two_plates(gap=0.02, num_el=4, p=2):
    def plate_at(z):
        s = bilinear([0, 0, z], [1, 0, z], [0, 1, z], [1, 1, z])
        s = s.elevate(0, p - 1).elevate(1, p - 1)
        nk = np.linspace(0, 1, num_el + 1)[1:-1]
        return s.refine(0, nk).refine(1, nk)

    sys = NonMatchingSystem([plate_at(gap), plate_at(0.0)],
                            E=1e7, nu=0.3, h_th=0.01, specs=None)
    for ip in (0, 1):
        sys.add_side_bc(ip, direction=0, side=0, n_layers=2)
    return sys


def test_contact_prevents_penetration():
    gap = 0.02
    load = [0.0, 0.0, -40.0]

    sys0 = _two_plates(gap)
    sys0.set_dead_load([load, [0, 0, 0]])
    d_free = sys0.solve_nonlinear(rtol=1e-10)
    w_free = sys0.evaluate_displacement(d_free, 0, [1.0, 0.5])[2]
    assert w_free < -gap  # without contact the plates interpenetrate

    sys1 = _two_plates(gap)
    sys1.set_dead_load([load, [0, 0, 0]])
    sys1.set_contact([(0, 1)], k_pen=1e9, r_max=0.01)
    d_c = sys1.solve_nonlinear(rtol=1e-10)
    wa = sys1.evaluate_displacement(d_c, 0, [1.0, 0.5])[2]
    wb = sys1.evaluate_displacement(d_c, 1, [1.0, 0.5])[2]
    # upper tip stops at/above the lower plate (which deflects too)
    assert wa > w_free + 1e-4
    assert (gap + wa) - wb > -2e-3, (wa, wb)
    # lower plate is pushed down through contact
    assert wb < -1e-5


def test_contact_gradient_parity():
    sys = _two_plates()
    sys.set_dead_load([[0, 0, -20.0], [0, 0, 0]])
    sys.set_contact([(0, 1)], k_pen=1e8, r_max=0.012)

    from goldfish_tpu.physics import kl_shell
    from goldfish_tpu.solver.implicit import build_solve_fn

    solve = build_solve_fn(sys.data, rtol=1e-11, max_it=30)
    d0 = sys.zero_displacement()

    def J(h):
        d = solve(sys.cp, h, d0)
        return kl_shell.internal_energy(sys.stack, d, sys.cp, h,
                                        sys.E, sys.nu)

    g = jax.grad(J)(sys.h_init)
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.normal(size=sys.h_init.shape)
                    * np.asarray(sys.stack.cp_mask))
    eps = 1e-6
    fd = (J(sys.h_init + eps * v) - J(sys.h_init - eps * v)) / (2 * eps)
    ad = jnp.sum(g * v)
    assert abs(float(ad - fd)) / abs(float(fd)) < 1e-5, (float(ad), float(fd))
