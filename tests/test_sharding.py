"""Patch-sharded execution equivalence: the sharded system must produce
the same residual/energy/solution as the unsharded one (8 virtual CPU
devices via conftest)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from goldfish_tpu.models import wing
from goldfish_tpu.parallel.sharding import (
    make_mesh,
    pad_state,
    pad_system,
    shard_system,
    state_sharding,
)
from goldfish_tpu.solver.implicit import newton_solve
from goldfish_tpu.solver.system import residual, total_potential


@pytest.fixture(scope="module")
def small_wing():
    return wing.build(n_chord=2, n_span=2, num_el=2, p=2)


def test_padded_system_equivalence(small_wing):
    sys = small_wing
    P = sys.num_splines
    data8 = pad_system(sys.data, 8)
    cp8 = pad_state(sys.cp, 8, "repeat")
    h8 = pad_state(sys.h_init, 8, "repeat")
    d8 = pad_state(sys.zero_displacement(), 8, "zero")
    Pi = float(total_potential(sys.data, sys.zero_displacement(),
                               sys.cp, sys.h_init))
    Pi8 = float(total_potential(data8, d8, cp8, h8))
    assert abs(Pi - Pi8) <= 1e-12 * max(abs(Pi), 1.0)
    r = residual(sys.data, sys.zero_displacement(), sys.cp, sys.h_init)
    r8 = residual(data8, d8, cp8, h8)
    assert np.allclose(np.asarray(r8[:P]), np.asarray(r), atol=1e-12)
    assert np.abs(np.asarray(r8[P:])).max() == 0.0


def test_sharded_solve_matches_unsharded(small_wing):
    sys = small_wing
    assert len(jax.devices()) >= 8
    d_ref, it_ref, _ = newton_solve(sys.data, sys.cp, sys.h_init,
                                    sys.zero_displacement(), rtol=1e-10)

    mesh = make_mesh(jax.devices()[:8])
    data8 = shard_system(pad_system(sys.data, 8), mesh)
    sh = state_sharding(mesh)
    cp8 = jax.device_put(pad_state(sys.cp, 8, "repeat"), sh)
    h8 = jax.device_put(pad_state(sys.h_init, 8, "repeat"), sh)
    d08 = jax.device_put(pad_state(sys.zero_displacement(), 8, "zero"), sh)
    d8, it8, _ = newton_solve(data8, cp8, h8, d08, rtol=1e-10)

    P = sys.num_splines
    err = np.abs(np.asarray(d8[:P]) - np.asarray(d_ref)).max()
    scale = np.abs(np.asarray(d_ref)).max()
    assert err < 1e-9 * max(scale, 1e-30), (err, scale)
