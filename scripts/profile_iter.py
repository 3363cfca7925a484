#!/usr/bin/env python
"""Stage-level profile of one warm bench opt-iteration on the real TPU.

Forces a scalar readback after every stage (block_until_ready does NOT
block on axon, CLAUDE.md) so each stage's wall time is real.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("GOLDFISH_TPU_X64", "1")

import jax
import jax.numpy as jnp

from goldfish_tpu.config import use_x64

use_x64(True)

from goldfish_tpu.design.pipeline import ThicknessFFD
from goldfish_tpu.models import wing
from goldfish_tpu.physics import kl_shell
from goldfish_tpu.solver import devicechol
from goldfish_tpu.solver.implicit import (
    _jit_assemble_K,
    _jit_potential,
    _jit_residual,
    _jit_residual_vjp,
    build_solve_fn,
)


def rb(x):
    """Force a readback of one scalar."""
    return float(jnp.asarray(x).ravel()[0])


def main():
    print("backend:", jax.default_backend(), flush=True)
    sys_ = wing.build(num_el=6, p=3)
    th = ThicknessFFD(sys_, num_els=(4, 4, 1), p=(2, 2, 1))
    data = sys_.data
    cp = sys_.cp
    solve = build_solve_fn(data, rtol=1e-9, max_it=30)
    energy = jax.jit(kl_shell.internal_energy)

    h0 = jnp.asarray(th.init_h_ffd(wing.H_TH))
    d0 = sys_.zero_displacement()

    # converge once (cold) to get the warm-start state
    def opt_iteration(h_ffd, d_ws):
        h = th(h_ffd)
        d = solve(cp, h, d_ws)
        J = energy(sys_.stack, d, cp, h, sys_.E, sys_.nu)
        return J, d

    vg = jax.value_and_grad(opt_iteration, has_aux=True)
    t0 = time.perf_counter()
    (J, d), g = vg(h0, d0)
    rb(J); rb(g); rb(d)
    print(f"cold iteration: {time.perf_counter()-t0:.2f}s J={float(J):.6e}",
          flush=True)

    # ---- instrumented warm iteration ----
    hk = h0 * (1.0 + 1e-4)
    h = th(hk)
    rb(h)

    t_total0 = time.perf_counter()

    # forward Newton, hand-rolled with timers (device-chol path)
    dcur = d
    t0 = time.perf_counter(); r = _jit_residual(data, cp, h, dcur); rn0 = float(jnp.linalg.norm(r))
    print(f"  residual eval: {time.perf_counter()-t0:.3f}s |r|={rn0:.3e}", flush=True)
    its = 0
    while True:
        t0 = time.perf_counter(); K = _jit_assemble_K(data, cp, h, dcur); rb(K)
        t_asm = time.perf_counter() - t0
        t0 = time.perf_counter()
        dds = devicechol.DeviceDirectSolver().factor_from_K(K)
        rb(dds.dc._L)
        t_fac = time.perf_counter() - t0
        t0 = time.perf_counter(); delta = dds.solve(-r) * data.free; rb(delta)
        t_sol = time.perf_counter() - t0
        t0 = time.perf_counter()
        Pi0 = float(_jit_potential(data, cp, h, dcur))
        Pi1 = float(_jit_potential(data, cp, h, dcur + delta))
        t_pot = time.perf_counter() - t0
        dcur = dcur + delta
        t0 = time.perf_counter(); r = _jit_residual(data, cp, h, dcur)
        rn = float(jnp.linalg.norm(r)); t_res = time.perf_counter() - t0
        its += 1
        print(f"  newton it{its}: asm={t_asm:.3f}s fac={t_fac:.3f}s "
              f"solve={t_sol:.3f}s pot={t_pot:.3f}s res={t_res:.3f}s "
              f"|r|={rn:.3e} Pi {Pi0:.9e}->{Pi1:.9e}", flush=True)
        if rn < 1e-9 * rn0 or rn < 1.5e-4 * rn0 and its >= 2 or its >= 6:
            break
        if rn > 0.5 * rn0:
            break
        rn0 = max(rn0, rn)

    # objective
    t0 = time.perf_counter()
    J = energy(sys_.stack, dcur, cp, h, sys_.E, sys_.nu)
    gJ = jax.jit(jax.grad(kl_shell.internal_energy, argnums=1))(
        sys_.stack, dcur, cp, h, sys_.E, sys_.nu)
    rb(J); rb(gJ)
    print(f"  objective+dJ/dd: {time.perf_counter()-t0:.3f}s", flush=True)

    # adjoint with a FRESH factor (current production path)
    t0 = time.perf_counter(); K = _jit_assemble_K(data, cp, h, dcur); rb(K)
    t_asm = time.perf_counter() - t0
    t0 = time.perf_counter()
    dds2 = devicechol.DeviceDirectSolver().factor_from_K(K)
    rb(dds2.dc._L)
    t_fac = time.perf_counter() - t0
    t0 = time.perf_counter(); lam = dds2.solve(gJ * data.free) * data.free; rb(lam)
    t_sol = time.perf_counter() - t0
    t0 = time.perf_counter()
    dcp, dh = _jit_residual_vjp(data, dcur, cp, h, lam); rb(dh)
    t_vjp = time.perf_counter() - t0
    print(f"  adjoint: asm={t_asm:.3f}s fac={t_fac:.3f}s solve={t_sol:.3f}s "
          f"vjp={t_vjp:.3f}s", flush=True)

    print(f"TOTAL warm iteration: {time.perf_counter()-t_total0:.3f}s",
          flush=True)

    # experiment: how good is the adjoint solve using the factor from the
    # FIRST newton iterate (stale by |d_final - d_warmstart|)?
    x_exact = dds2.solve(gJ * data.free)
    x_stale = dds.solve(gJ * data.free)  # factor of K at previous state, IR vs ITS OWN K
    # IR of stale factor against the FRESH K:
    bf = (gJ * data.free).reshape(-1)
    x = dds.dc.solve(bf)
    for i in range(6):
        r_ = bf - K @ x
        print(f"  staleIR sweep{i}: |r|={float(jnp.linalg.norm(r_)):.3e}", flush=True)
        x = x + dds.dc.solve(r_)
    err = float(jnp.linalg.norm(x - x_exact.reshape(-1)) / jnp.linalg.norm(x_exact))
    print(f"  stale-factor IR vs fresh solve rel err: {err:.3e}", flush=True)


if __name__ == "__main__":
    main()
