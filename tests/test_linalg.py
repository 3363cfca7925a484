"""Mixed-precision GMRES-IR vs native f64 direct solve, on a genuinely
ill-conditioned KL-shell tangent (cond ~ 1e10) — validates the TPU
linear-solver path (solver/linalg.py) on the CPU backend."""

import jax.numpy as jnp
import numpy as np

from goldfish_tpu.models import tbeam
from goldfish_tpu.solver import linalg
from goldfish_tpu.solver.system import assemble_K


def test_mixed_solve_matches_direct():
    sys = tbeam.build(num_el=4, p=2)
    K = assemble_K(sys.data, sys.zero_displacement(), sys.cp, sys.h_init)
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.normal(size=K.shape[0]))

    x_direct = jnp.linalg.solve(K, b)
    x_mixed = linalg.mixed_solve(K, b, tol=1e-12)
    num = float(jnp.linalg.norm(x_mixed - x_direct))
    den = float(jnp.linalg.norm(x_direct))
    assert num / den < 1e-8, num / den


def test_mode_dispatch_cpu_default():
    assert linalg.mode() == "direct"  # tests run on the cpu backend
    linalg.set_mode("mixed")
    try:
        assert linalg.mode() == "mixed"
    finally:
        linalg.set_mode(None)
