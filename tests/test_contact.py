"""Shell-shell contact (physics/contact.py — the reference's
ShellContactContext hook).

The pair-potential energy is validated for (a) physics: the potential
resists interpenetration of two stacked plates, and (b) exact
differentiability of the contact energy wrt displacement, geometry and
the solve chain. NOTE: equilibrium solves with active contact are
stiff boundary-layer problems; plain damped Newton crawls (hundreds of
iterations) — load continuation (`solver.implicit.continuation_solve`)
helps but a trust-region/dynamic-relaxation solver is future work.
"""

import jax
import jax.numpy as jnp
import numpy as np

from goldfish_tpu.geometry.cadkit import bilinear
from goldfish_tpu.physics.contact import build_contact, contact_energy
from goldfish_tpu.solver.system import NonMatchingSystem, total_potential


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


def test_contact_energy_activates_on_approach():
    gap = 0.02
    sys = _two_plates(gap)
    contact = build_contact([(0, 1)], k_pen=1e9, r_max=0.01)
    d = sys.zero_displacement()
    # far apart: zero energy
    W0 = float(contact_energy(contact, sys.stack, d, sys.cp))
    assert W0 == 0.0
    # move the upper plate down into range: energy turns on and grows
    d1 = d.at[0, :, 2].add(-0.015)
    d2 = d.at[0, :, 2].add(-0.019)
    W1 = float(contact_energy(contact, sys.stack, d1, sys.cp))
    W2 = float(contact_energy(contact, sys.stack, d2, sys.cp))
    assert 0.0 < W1 < W2


def test_contact_resists_penetration_energetically():
    """The contact barrier dominates the load work near the wall: the
    total potential at an interpenetrating state exceeds the potential
    at a touching state (so a minimizer cannot pass through)."""
    gap = 0.02
    sys = _two_plates(gap)
    sys.set_dead_load([[0, 0, -3.0], [0, 0, 0]])
    sys.set_contact([(0, 1)], k_pen=1e12, r_max=0.01)
    data = sys.data
    d_touch = sys.zero_displacement().at[0, :, 2].add(-(gap - 0.011))
    d_pen = sys.zero_displacement().at[0, :, 2].add(-(gap + 0.002))
    Pi_touch = float(total_potential(data, d_touch, sys.cp, sys.h_init))
    Pi_pen = float(total_potential(data, d_pen, sys.cp, sys.h_init))
    assert Pi_pen > Pi_touch


def test_contact_gradients_exact():
    """AD gradients of the contact energy wrt d and cp vs central FD."""
    sys = _two_plates()
    contact = build_contact([(0, 1)], k_pen=1e8, r_max=0.015)
    rng = np.random.default_rng(0)
    d = sys.zero_displacement().at[0, :, 2].add(-0.012)
    d = d + 1e-4 * jnp.asarray(
        rng.normal(size=np.asarray(d).shape)) * sys.stack.cp_mask[..., None]

    W = lambda dd, cpp: contact_energy(contact, sys.stack, dd, cpp)
    gd, gcp = jax.grad(W, argnums=(0, 1))(d, sys.cp)
    vd = jnp.asarray(rng.normal(size=np.asarray(d).shape)
                     * np.asarray(sys.stack.cp_mask)[..., None])
    vc = jnp.asarray(rng.normal(size=np.asarray(d).shape)
                     * np.asarray(sys.stack.cp_mask)[..., None]) * 1e-2
    eps = 1e-7
    fd_d = (W(d + eps * vd, sys.cp) - W(d - eps * vd, sys.cp)) / (2 * eps)
    fd_c = (W(d, sys.cp + eps * vc) - W(d, sys.cp - eps * vc)) / (2 * eps)
    assert abs(float(jnp.sum(gd * vd) - fd_d)) / abs(float(fd_d)) < 1e-6
    assert abs(float(jnp.sum(gcp * vc) - fd_c)) / abs(float(fd_c)) < 1e-6
