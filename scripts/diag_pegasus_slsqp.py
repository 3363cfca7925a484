#!/usr/bin/env python
"""Wall-clock attribution for the pegasus-91 SLSQP run (TPU).

diag_pegasus_factor.py showed a refactor costs only ~3.4 s and even a
1e-2-stale factor refines adjoint-grade in 4 sweeps — so the 386 s /
3-iteration SLSQP wall in PEGASUS_TPU.json is NOT explained by factor
maintenance. This script reruns the identical OptProblem with the
persistent factor's entry points wrapped in wall timers and per-call
logs of certificates and refactorizations, to attribute the time:
big-step Newton iteration counts, line-search trials, adjoint solves,
or harness overhead."""
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

EVENTS = []


def force(*xs):
    return float(sum(jnp.asarray(x).ravel()[0] for x in xs))


def timed(tag, fn, fac):
    import functools

    @functools.wraps(fn)
    def w(*a, **k):
        t0 = time.perf_counter()
        nf0 = fac.n_factor
        nc0 = len(fac.cert_log)
        out = fn(*a, **k)
        EVENTS.append((tag, time.perf_counter() - t0,
                       fac.n_factor - nf0, fac.cert_log[nc0:]))
        return out

    return w


def main():
    from goldfish_tpu.design.pipeline import ThicknessFFD
    from goldfish_tpu.models import boxwing
    from goldfish_tpu.physics import kl_shell
    from goldfish_tpu.solver.implicit import build_solve_fn

    print("backend:", jax.default_backend(), flush=True)
    t0 = time.perf_counter()
    sys_ = boxwing.build(n_sections=N_SECTIONS, num_el=NUM_EL, p=P_DEG)
    th = ThicknessFFD(sys_, num_els=(1, 6, 1), p=(1, 2, 1))
    data = sys_.data
    cp = sys_.cp
    print(f"build {time.perf_counter() - t0:.1f}s", flush=True)

    solve = build_solve_fn(data, rtol=1e-9, max_it=30)
    fac = solve.device_factor

    def opt_iteration(h_ffd, d0):
        h = th(h_ffd)
        d = solve(cp, h, d0)
        J = kl_shell.internal_energy(sys_.stack, d, cp, h, sys_.E,
                                     sys_.nu)
        return J, d

    vg = jax.value_and_grad(opt_iteration, has_aux=True)
    h0 = jnp.asarray(th.init_h_ffd(boxwing.H_TH))
    d0 = sys_.zero_displacement()
    t0 = time.perf_counter()
    (J, d), g = vg(h0, d0)
    force(J, d, g)
    print(f"cold {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    (Jk, dk), gk = vg(h0 * (1 + 1e-4), d)
    force(Jk, dk, gk)
    print(f"warm {time.perf_counter() - t0:.1f}s", flush=True)

    # instrument the factor entry points
    for name in ("exact_solve", "newton_direction", "ensure",
                 "ir_solve_async", "finish_ir"):
        if hasattr(fac, name):
            setattr(fac, name, timed(name, getattr(fac, name), fac))

    from goldfish_tpu.opt.problem import OptProblem

    V0 = float(sys_.volume())

    t_eval = []

    def obj(dvs, dd):
        t0 = time.perf_counter()
        Jv, dn = opt_iteration(dvs["h_ffd"], dd)
        t_eval.append(("obj", time.perf_counter() - t0))
        return Jv, dn

    def vol(dvs):
        t0 = time.perf_counter()
        v = kl_shell.volume(sys_.stack, cp, th(dvs["h_ffd"]))
        t_eval.append(("vol", time.perf_counter() - t0))
        return v

    prob = OptProblem()
    prob.add_design_var("h_ffd", th.init_h_ffd(boxwing.H_TH),
                        lower=boxwing.H_TH / 5, upper=boxwing.H_TH * 5,
                        scaler=1e2)
    prob.set_objective(obj, scaler=1.0, state0=d0)
    prob.add_constraint("volume", vol, equals=V0, scaler=1e2)
    t0 = time.perf_counter()
    res = prob.run_slsqp(maxiter=3, tol=1e-12, verbose=True)
    t_slsqp = time.perf_counter() - t0
    print(f"SLSQP {res.nit} its {t_slsqp:.1f}s J->{res.fun:.6e} "
          f"nfev={res.nfev} njev={res.njev}", flush=True)

    # ---- attribution
    tot = {}
    for tag, dt, nref, certs in EVENTS:
        tot.setdefault(tag, [0.0, 0, 0])
        tot[tag][0] += dt
        tot[tag][1] += 1
        tot[tag][2] += nref
    print("\nfactor-method attribution (s, calls, refactors):")
    for tag, (s, n, r) in sorted(tot.items(), key=lambda kv: -kv[1][0]):
        print(f"  {tag:16s} {s:8.2f}s  x{n:3d}  refac {r}", flush=True)
    print("\nper-event log (>0.5s):")
    for tag, dt, nref, certs in EVENTS:
        if dt > 0.5:
            print(f"  {tag:16s} {dt:7.2f}s refac={nref} certs={certs}",
                  flush=True)
    n_obj = sum(1 for t, _ in t_eval if t == "obj")
    s_obj = sum(dt for t, dt in t_eval if t == "obj")
    print(f"\nobj (forward-only) calls: {n_obj}, {s_obj:.1f}s total; "
          f"slsqp wall {t_slsqp:.1f}s", flush=True)


if __name__ == "__main__":
    main()
