#!/usr/bin/env python
"""Factor-quality + refactor-cost breakdown at pegasus scale (TPU).

The PEGASUS_TPU.json SLSQP run spends most of its 129 s/iteration on
(a) 7 refactorizations and (b) repeated 16-sweep IR programs whose
certificates imply a per-sweep contraction rho ~0.6 — an order worse
than the rho ~0.07 a fresh factor measures at wing scale (N=6600).
This script separates the hypotheses ON HARDWARE at N_pad=11466:

  1. fresh-factor rho at the converged equilibrium (random + adjoint
     rhs, sweep counts 1/2/4/8) — if mediocre, the FACTOR QUALITY
     (panel-inverse accuracy at this scale) is the problem;
  2. rho of a 1e-2-design-stale factor at the neighbor equilibrium —
     if only THIS is mediocre, the 16-sweep certs are staleness and a
     rho-aware refresh (like system_mi.rho_refresh) is the fix;
  3. wall-time split of one refactor: assemble_K (jet Hessians +
     matmul scatter) vs blocked Cholesky factor, vs one 16-sweep IR
     program — what a refactor actually buys relative to sweeping.

Reference scale anchor: the reference's largest demo
(/root/reference/demos_om/thickness_opt/pegasus/pegasus_var_th_opt_wint
.py:203-206).
"""
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

N_SECTIONS = 18
NUM_EL = 3
P_DEG = 3


def force(*xs):
    return float(sum(jnp.asarray(x).ravel()[0] for x in xs))


def main():
    from goldfish_tpu.design.pipeline import ThicknessFFD
    from goldfish_tpu.models import boxwing
    from goldfish_tpu.physics import kl_shell
    from goldfish_tpu.solver.devicechol import (
        PersistentDeviceFactor,
        _jvp_ir_solve,
    )
    from goldfish_tpu.solver.implicit import _jit_assemble_K, newton_solve_host

    print("backend:", jax.default_backend(), flush=True)
    t0 = time.perf_counter()
    sys_ = boxwing.build(n_sections=N_SECTIONS, num_el=NUM_EL, p=P_DEG)
    th = ThicknessFFD(sys_, num_els=(1, 6, 1), p=(1, 2, 1))
    data = sys_.data
    cp = sys_.cp
    h = th(jnp.asarray(th.init_h_ffd(boxwing.H_TH)))
    print(f"build {time.perf_counter() - t0:.1f}s", flush=True)

    fac = PersistentDeviceFactor(data)
    t0 = time.perf_counter()
    d, it, rn = newton_solve_host(data, cp, h, sys_.zero_displacement(),
                                  rtol=1e-9, device_fac=fac)
    print(f"newton: {it} its rn={rn:.2e} ({time.perf_counter() - t0:.1f}s)",
          flush=True)

    # ---- 3a. refactor cost split (warm: 2nd call timed)
    K = _jit_assemble_K(data, cp, h, d)
    force(K)
    t0 = time.perf_counter()
    K = _jit_assemble_K(data, cp, h, d)
    force(K)
    t_asm = time.perf_counter() - t0
    fac.dc.factor(K)
    force(fac.dc._L)
    t0 = time.perf_counter()
    fac.dc.factor(K)
    force(fac.dc._L)
    t_fac = time.perf_counter() - t0
    print(f"refactor split: assemble_K {t_asm:.2f}s + factor {t_fac:.2f}s",
          flush=True)

    # ---- 1. fresh-factor contraction at the equilibrium
    fac.ensure(cp, h, d, force=True, why="diag-fresh")
    rng = np.random.default_rng(0)
    b_rand = jnp.asarray(rng.standard_normal(np.asarray(d).shape))
    b_rand = b_rand * data.free
    b_adj = jax.grad(lambda dd: kl_shell.internal_energy(
        sys_.stack, dd, cp, h, sys_.E, sys_.nu))(d) * data.free
    for name, b in (("rand", b_rand), ("adjoint", b_adj)):
        for n in (1, 2, 4, 8):
            x, ratio = _jvp_ir_solve(data, fac.dc._L, fac.dc._invs,
                                     fac.dc._dscale, cp, h, d, b,
                                     nb=fac.dc.nb, n_ir=n)
            r = float(ratio)
            rho = r ** (1.0 / n)
            print(f"fresh {name:7s} n={n:2d}: cert {r:.3e} rho {rho:.3f}",
                  flush=True)

    # timing of warm IR programs (n=4 and n=16)
    for n in (4, 16):
        x, ratio = _jvp_ir_solve(data, fac.dc._L, fac.dc._invs,
                                 fac.dc._dscale, cp, h, d, b_rand,
                                 nb=fac.dc.nb, n_ir=n)
        force(x)
        t0 = time.perf_counter()
        x, ratio = _jvp_ir_solve(data, fac.dc._L, fac.dc._invs,
                                 fac.dc._dscale, cp, h, d, b_rand,
                                 nb=fac.dc.nb, n_ir=n)
        force(x)
        print(f"IR program n={n:2d}: {time.perf_counter() - t0:.2f}s warm",
              flush=True)

    # ---- 2. staleness: 1e-2 design step, factor NOT refreshed
    h2 = th(jnp.asarray(th.init_h_ffd(boxwing.H_TH)) * 1.01)
    fac2 = PersistentDeviceFactor(data)
    t0 = time.perf_counter()
    d2, it2, rn2 = newton_solve_host(data, cp, h2, d, rtol=1e-9,
                                     device_fac=fac2)
    print(f"neighbor newton: {it2} its rn={rn2:.2e} "
          f"({time.perf_counter() - t0:.1f}s)", flush=True)
    b2 = jax.grad(lambda dd: kl_shell.internal_energy(
        sys_.stack, dd, cp, h2, sys_.E, sys_.nu))(d2) * data.free
    for n in (4, 8, 16):
        x, ratio = _jvp_ir_solve(data, fac.dc._L, fac.dc._invs,
                                 fac.dc._dscale, cp, h2, d2, b2,
                                 nb=fac.dc.nb, n_ir=n)
        r = float(ratio)
        rho = r ** (1.0 / n)
        print(f"stale(1e-2) adjoint n={n:2d}: cert {r:.3e} rho {rho:.3f}",
              flush=True)

    # mid-Newton staleness: the state HALFWAY to the neighbor
    # equilibrium (where SLSQP-eval dir solves actually run)
    dm = 0.5 * (d + d2)
    rm = jax.grad(lambda dd: kl_shell.internal_energy(
        sys_.stack, dd, cp, h2, sys_.E, sys_.nu))(dm) * data.free
    for n in (4, 16):
        x, ratio = _jvp_ir_solve(data, fac.dc._L, fac.dc._invs,
                                 fac.dc._dscale, cp, h2, dm, rm,
                                 nb=fac.dc.nb, n_ir=n)
        r = float(ratio)
        rho = r ** (1.0 / n)
        print(f"midpath(1e-2) n={n:2d}: cert {r:.3e} rho {rho:.3f}",
              flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
