#!/usr/bin/env python
"""Iteration-level trace of the stagnating pegasus SLSQP evaluation.

diag_pegasus_slsqp.py showed one SLSQP evaluation burning 13 Newton
iterations with bit-identical direction certificates (the residual
pinned at its floor above rtol*r_ref) and a later evaluation stuck on
16-sweep IR programs (rho_est poisoned by floored certificates). This
script reruns the SLSQP with each evaluation's (h_ffd, incoming d)
recorded, then replays every evaluation through
newton_solve_host(verbose=True) to expose per-iteration |r| and alpha.
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
    from goldfish_tpu.solver.devicechol import PersistentDeviceFactor
    from goldfish_tpu.solver.implicit import (
        build_solve_fn,
        newton_solve_host,
    )

    print("backend:", jax.default_backend(), flush=True)
    sys_ = boxwing.build(n_sections=N_SECTIONS, num_el=NUM_EL, p=P_DEG)
    th = ThicknessFFD(sys_, num_els=(1, 6, 1), p=(1, 2, 1))
    data = sys_.data
    cp = sys_.cp

    solve = build_solve_fn(data, rtol=1e-9, max_it=30)

    rec = []  # (h_ffd, d_in) per objective evaluation

    def opt_iteration(h_ffd, d0):
        h = th(h_ffd)
        d = solve(cp, h, d0)
        J = kl_shell.internal_energy(sys_.stack, d, cp, h, sys_.E,
                                     sys_.nu)
        return J, d

    vg = jax.value_and_grad(opt_iteration, has_aux=True)
    h0 = jnp.asarray(th.init_h_ffd(boxwing.H_TH))
    d0 = sys_.zero_displacement()
    (J, d), g = vg(h0, d0)
    force(J, d, g)
    (Jk, dk), gk = vg(h0 * (1 + 1e-4), d)
    force(Jk, dk, gk)
    print("warmed", flush=True)

    from goldfish_tpu.opt.problem import OptProblem

    V0 = float(sys_.volume())

    def _rec(hf, dd):
        rec.append((np.asarray(hf), np.asarray(dd)))

    def obj(dvs, dd):
        # runtime callback: obj is traced under value_and_grad, so a
        # direct np.asarray on the args raises TracerArrayConversion
        jax.debug.callback(_rec, dvs["h_ffd"], dd)
        Jv, dn = opt_iteration(dvs["h_ffd"], dd)
        return Jv, dn

    def vol(dvs):
        return kl_shell.volume(sys_.stack, cp, th(dvs["h_ffd"]))

    prob = OptProblem()
    prob.add_design_var("h_ffd", th.init_h_ffd(boxwing.H_TH),
                        lower=boxwing.H_TH / 5, upper=boxwing.H_TH * 5,
                        scaler=1e2)
    prob.set_objective(obj, scaler=1.0, state0=d0)
    prob.add_constraint("volume", vol, equals=V0, scaler=1e2)
    t0 = time.perf_counter()
    res = prob.run_slsqp(maxiter=3, tol=1e-12, verbose=True)
    print(f"SLSQP {res.nit} its {time.perf_counter() - t0:.1f}s "
          f"J->{res.fun:.6e}; {len(rec)} obj evals", flush=True)
    np.savez("/tmp/pegasus_slsqp_path.npz",
             **{f"h{k}": h for k, (h, _) in enumerate(rec)},
             **{f"d{k}": d for k, (_, d) in enumerate(rec)})

    # ---- replay each evaluation with a verbose Newton
    for k, (hf, din) in enumerate(rec):
        h = th(jnp.asarray(hf))
        dh_rel = float(np.linalg.norm(hf - np.asarray(h0))
                       / np.linalg.norm(np.asarray(h0)))
        fac = PersistentDeviceFactor(data)
        print(f"\n== eval {k}: |dh|/|h0| = {dh_rel:.3e} "
              f"(fresh factor) ==", flush=True)
        t0 = time.perf_counter()
        dsol, it, rn = newton_solve_host(data, cp, h, jnp.asarray(din),
                                         rtol=1e-9, max_it=30,
                                         verbose=True, device_fac=fac)
        print(f"eval {k}: {it} its rn={rn:.3e} "
              f"({time.perf_counter() - t0:.1f}s) "
              f"certs={fac.cert_log[-6:]} refac={fac.refactor_log}",
              flush=True)


if __name__ == "__main__":
    main()
