#!/usr/bin/env python
"""On the real wing tangent AT EQUILIBRIUM: fresh-IR floor, DESIGN-stale
factor refinement (decides cross-iteration factor amortization), and
jvp-based matrix-free matvec validation/timing (decides whether IR can
skip assembling fresh K entirely)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("GOLDFISH_TPU_X64", "1")

import jax
import jax.numpy as jnp
import numpy as np

from goldfish_tpu.config import use_x64

use_x64(True)

from goldfish_tpu.design.pipeline import ThicknessFFD
from goldfish_tpu.models import wing
from goldfish_tpu.solver.implicit import _jit_assemble_K, newton_solve_host
from goldfish_tpu.solver.system import tangent_matvec
from goldfish_tpu.solver.tpu_cholesky import DeviceCholesky


def rb(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.asarray(leaf).ravel()[0])


def timeit(f, *a, n=3):
    rb(f(*a))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        rb(f(*a))
        ts.append(time.perf_counter() - t0)
    return min(ts)


@jax.jit
def _jit_tangent_mv(data, cp, h, d, v):
    return tangent_matvec(data, d, cp, h, v)


def main():
    print("backend:", jax.default_backend(), flush=True)
    sys_ = wing.build(num_el=6, p=3)
    th = ThicknessFFD(sys_, num_els=(4, 4, 1), p=(2, 2, 1))
    data = sys_.data
    cp = sys_.cp
    h0 = jnp.asarray(th.init_h_ffd(wing.H_TH))
    h = th(h0)
    rng = np.random.default_rng(0)

    t0 = time.perf_counter()
    d, its, rn = newton_solve_host(data, cp, h, sys_.zero_displacement(),
                                   rtol=1e-9, max_it=30)
    print(f"equilibrium: {its} its |r|={rn:.2e} "
          f"({time.perf_counter()-t0:.0f}s)", flush=True)

    K = _jit_assemble_K(data, cp, h, d)
    Kh = np.asarray(K)
    t_asm = timeit(_jit_assemble_K, data, cp, h, d)
    print(f"assemble_K: {t_asm:.3f}s", flush=True)

    dc = DeviceCholesky(nb=256, mb=16)
    dc.factor(K)
    t_fac = timeit(lambda k: dc.factor(k)._L, K)
    print(f"factor: {t_fac:.3f}s", flush=True)

    b = jnp.asarray(rng.normal(size=Kh.shape[0])) * data.free.reshape(-1)
    bh = np.asarray(b)
    for n_ir in (0, 1, 2, 3):
        x = np.asarray(dc.solve_ir(K, b, n_ir=n_ir) if n_ir
                       else dc.solve(b))
        res = np.linalg.norm(Kh @ x - bh) / np.linalg.norm(bh)
        print(f"  fresh IR n={n_ir}: res {res:.2e}", flush=True)
    t_sol = timeit(lambda k, v: dc.solve_ir(k, v, n_ir=2), K, b)
    print(f"solve_ir(2): {t_sol*1e3:.0f} ms", flush=True)

    # jvp matrix-free matvec: validate vs dense K, time it
    v = jnp.asarray(rng.normal(size=np.asarray(cp).shape)) * data.free
    mv_dense = Kh @ np.asarray(v).reshape(-1)
    mv_jvp = np.asarray(_jit_tangent_mv(data, cp, h, d, v)).reshape(-1)
    # fixed dofs: dense K has identity rows; jvp masks them to zero
    freeh = np.asarray(data.free).reshape(-1)
    err = np.linalg.norm((mv_jvp - mv_dense) * freeh) \
        / np.linalg.norm(mv_dense * freeh)
    print(f"jvp matvec vs dense K: rel err {err:.3e}", flush=True)
    t_mv = timeit(_jit_tangent_mv, data, cp, h, d, v)
    print(f"jvp matvec: {t_mv*1e3:.0f} ms", flush=True)

    # ---- DESIGN-stale factor + fused IR (factor from h0 equilibrium) ----
    for scale_h in (1e-4, 1e-3, 1e-2):
        hk = th(h0 * (1.0 + scale_h))
        dk, _, _ = newton_solve_host(data, cp, hk, d, rtol=1e-9,
                                     max_it=30)
        Kk = _jit_assemble_K(data, cp, hk, dk)
        Kkh = np.asarray(Kk)
        x_ref = np.linalg.solve(Kkh, bh)
        for n_ir in (1, 2, 3, 4):
            x = np.asarray(dc.solve_ir(Kk, b, n_ir=n_ir))
            res = np.linalg.norm(Kkh @ x - bh) / np.linalg.norm(bh)
            err = np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref)
            print(f"  stale dh/h={scale_h:g} IR n={n_ir}: res {res:.2e} "
                  f"relerr {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
