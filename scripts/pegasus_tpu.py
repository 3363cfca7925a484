#!/usr/bin/env python
"""Pegasus-class scale (91 patches, 8172 real dofs) ON THE TPU.

The reference's largest problem
(/root/reference/demos_om/thickness_opt/pegasus/pegasus_var_th_opt_wint
.py:203-206) ran only on CPU in round 2. CLAUDE.md records that some
gather-heavy f64 device programs SILENTLY CORRUPT at bench scale on
axon, so phase A validates every device program used by the solve at
THIS scale against the host oracle before anything is trusted:

  A. residual, assembled-K matvec, matrix-free jvp matvec, and one
     persistent-factor exact_solve — each vs the CPU/f64 oracle.
  B. full-chain gradient parity: dJ/dh_ffd (warm opt iteration) vs CPU.
  C. bench: warm per-iteration wall clock (1e-4 steps + one 1e-2
     refactor-forcing step) and a timed maxiter=3 SLSQP run.

Run twice:
  GOLDFISH_PEGASUS_CPU=1 python scripts/pegasus_tpu.py   # writes oracle
  python -u scripts/pegasus_tpu.py                       # TPU: validate+bench

Writes PEGASUS_TPU.json (repo root) in TPU mode.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("GOLDFISH_TPU_X64", "1")

import jax

CPU_MODE = os.environ.get("GOLDFISH_PEGASUS_CPU") == "1"
if CPU_MODE:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from goldfish_tpu.config import use_x64

use_x64(True)

REF = "/tmp/pegasus_ref.npz"
N_SECTIONS = 18
NUM_EL = 3
P_DEG = 3


def force(*xs):
    """axon block_until_ready doesn't block: force scalar readbacks."""
    return float(sum(jnp.asarray(x).ravel()[0] for x in xs))


def build():
    from goldfish_tpu.design.pipeline import ThicknessFFD
    from goldfish_tpu.models import boxwing

    t0 = time.perf_counter()
    sys_ = boxwing.build(n_sections=N_SECTIONS, num_el=NUM_EL, p=P_DEG)
    th = ThicknessFFD(sys_, num_els=(1, 6, 1), p=(1, 2, 1))
    print(f"build: {sys_.num_splines} patches, {len(sys_.specs)} "
          f"intersections, N_pad={sys_.num_splines * sys_.stack.max_cp * 3}"
          f" ({time.perf_counter() - t0:.1f}s)", flush=True)
    return sys_, th


def test_inputs(sys_):
    rng = np.random.default_rng(0)
    d_test = jnp.asarray(
        1e-4 * rng.standard_normal(sys_.zero_displacement().shape))
    d_test = d_test * sys_.data.free
    V = jnp.asarray(rng.standard_normal(
        (3,) + sys_.zero_displacement().shape))
    V = V * sys_.data.free
    return d_test, V


def main():
    from goldfish_tpu.models import boxwing
    from goldfish_tpu.physics import kl_shell
    from goldfish_tpu.solver.implicit import (
        _jit_assemble_K,
        _jit_residual,
        build_solve_fn,
    )
    from goldfish_tpu.solver.system import tangent_matvec

    print("backend:", jax.default_backend(), flush=True)
    sys_, th = build()
    cp = sys_.cp
    h_const = sys_.h_init
    d_test, V = test_inputs(sys_)
    data = sys_.data

    # ---- phase A programs (on either backend)
    t0 = time.perf_counter()
    r = _jit_residual(data, cp, h_const, d_test)
    force(r)
    print(f"A: residual ({time.perf_counter() - t0:.1f}s incl compile)",
          flush=True)

    t0 = time.perf_counter()
    K = _jit_assemble_K(data, cp, h_const, d_test)
    KV = jnp.einsum("ij,vj->vi", K,
                    V.reshape(3, -1)).reshape(V.shape)
    force(KV)
    print(f"A: assemble_K + K@V ({time.perf_counter() - t0:.1f}s)",
          flush=True)

    t0 = time.perf_counter()
    mv = jax.jit(tangent_matvec)
    jvpV = jnp.stack([mv(data, d_test, cp, h_const, V[i])
                      for i in range(3)])
    force(jvpV)
    print(f"A: jvp matvec ({time.perf_counter() - t0:.1f}s)", flush=True)

    # solve validation at d = 0: K(0) is SPD there (at the random
    # d_test the SVK tangent can be INDEFINITE — nonconvex energy away
    # from equilibrium, CLAUDE.md — and Cholesky rightly fails)
    d_zero = jnp.zeros_like(d_test)
    r0 = _jit_residual(data, cp, h_const, d_zero)
    if CPU_MODE:
        K0 = _jit_assemble_K(data, cp, h_const, d_zero)
        x_ref = jnp.linalg.solve(
            K0, (r0 * data.free).reshape(-1)).reshape(r0.shape) * data.free
    else:
        from goldfish_tpu.solver.devicechol import PersistentDeviceFactor

        t0 = time.perf_counter()
        fac = PersistentDeviceFactor(data)
        fac.ensure(cp, h_const, d_zero)
        x_ref = fac.exact_solve(cp, h_const, d_zero,
                                r0 * data.free) * data.free
        force(x_ref)
        print(f"A: factor+exact_solve ({time.perf_counter() - t0:.1f}s, "
              f"cert {fac.last_ratio:.2e})", flush=True)

    # ---- phase B: the optimization iteration (forward + adjoint)
    solve = build_solve_fn(data, rtol=1e-9, max_it=30)

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
    t_cold = time.perf_counter() - t0
    hk = h0 * (1.0 + 1e-4)
    t0 = time.perf_counter()
    (Jk, dk), gk = vg(hk, d)
    force(Jk, dk, gk)
    t_warm0 = time.perf_counter() - t0
    print(f"B: J={float(J):.10e} Jk={float(Jk):.10e} "
          f"|gk|={float(jnp.linalg.norm(gk)):.6e} "
          f"(cold {t_cold:.1f}s, warm {t_warm0:.1f}s)", flush=True)

    if CPU_MODE:
        np.savez(REF, r=np.asarray(r), KV=np.asarray(KV),
                 jvpV=np.asarray(jvpV), x=np.asarray(x_ref),
                 J=float(J), Jk=float(Jk), g=np.asarray(g),
                 gk=np.asarray(gk))
        print("oracle written:", REF, flush=True)
        return

    # ---- TPU: compare against the oracle
    ref = np.load(REF)
    rel = lambda a, b: float(np.linalg.norm(np.asarray(a) - b)
                             / (np.linalg.norm(b) + 1e-300))
    errs = {
        "residual": rel(r, ref["r"]),
        "KV": rel(KV, ref["KV"]),
        "jvpV": rel(jvpV, ref["jvpV"]),
        "solve": rel(x_ref, ref["x"]),
        "grad": rel(gk, ref["gk"]),
        "J": abs(float(Jk) - float(ref["Jk"])) / abs(float(ref["Jk"])),
    }
    print("VALIDATION vs host oracle:", json.dumps(errs), flush=True)
    for k in ("residual", "KV", "jvpV"):
        assert errs[k] < 1e-9, (k, errs[k])
    assert errs["solve"] < 1e-4, errs["solve"]   # IR floor ~2e-6
    assert errs["grad"] <= 1e-6, errs["grad"]

    # ---- phase C: warm per-iteration wall clock
    # Production warm-start semantics (secant extrapolation, same as
    # bench.py / the operations layer) + an UNTIMED settle loop over
    # both step signs so every IR-sweep-count program the adaptive
    # policy picks is compiled before the timed loop (a sweep-menu
    # compile inside a timed iteration shows up as a 100 s outlier —
    # CLAUDE.md round-3 facts).
    from goldfish_tpu.opt.warmstart import SecantWarmStart

    ws = SecantWarmStart()
    ws.update(h0 * (1.0 + 1e-4), dk)
    for dh in (-1e-4, -2e-4, 1e-4, 5e-4, -1e-4):
        hw = h0 * (1.0 + dh)
        (Jw, dk), gw = vg(hw, ws.predict(hw, dk))
        force(Jw, dk, gw)
        ws.update(hw, dk)
    times = []
    for k in range(4):
        hk = h0 * (1.0 + 1e-4 * (k + 2))
        t0 = time.perf_counter()
        (Jk, dk), gk = vg(hk, ws.predict(hk, dk))
        force(Jk, dk, gk)
        times.append(time.perf_counter() - t0)
        ws.update(hk, dk)
    times.sort()
    t_warm = times[len(times) // 2]
    # refactor-forcing step (SLSQP-realistic 1e-2 design delta)
    hbig = h0 * (1.0 + 1e-2)
    t0 = time.perf_counter()
    (Jb, db), gb = vg(hbig, ws.predict(hbig, dk))
    force(Jb, db, gb)
    t_refac = time.perf_counter() - t0
    print(f"C: warm {t_warm:.2f}s/it (all {[round(x,2) for x in times]}),"
          f" refactor-forcing(1e-2) {t_refac:.2f}s", flush=True)

    # ---- phase C2: a real SLSQP run (>=3 iterations)
    from goldfish_tpu.opt.problem import OptProblem

    V0 = float(sys_.volume())

    def obj(dvs, dd):
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
    fac2 = getattr(solve, "device_factor", None)
    # force-load every sweep-menu program variant UNTIMED: in the
    # previous run first-in-process loads (~15-18 s each through the
    # tunnel) of n_ir variants the warm-up had not sampled landed
    # inside the SLSQP wall (a 12 s n=16 direction, a 55 s seeded
    # adjoint load — scripts/diag_pegasus_slsqp.py)
    if fac2 is not None and getattr(fac2, "_ref", None) is not None:
        t0 = time.perf_counter()
        fac2.preload()
        print(f"preload {time.perf_counter() - t0:.1f}s", flush=True)
    nf0 = fac2.n_factor if fac2 is not None else 0
    nc0 = len(fac2.cert_log) if fac2 is not None else 0
    t0 = time.perf_counter()
    res = prob.run_slsqp(maxiter=3, tol=1e-12, verbose=True)
    t_slsqp = time.perf_counter() - t0
    nit = max(res.nit, 1)
    print(f"C2: SLSQP {res.nit} its in {t_slsqp:.1f}s "
          f"({t_slsqp / nit:.1f}s/it), J {res.history[0] if res.history else float('nan'):.6e}"
          f" -> {res.fun:.6e}", flush=True)
    n_refactor = None
    if fac2 is not None:
        n_refactor = fac2.n_factor - nf0
        print(f"C2: {n_refactor} refactorizations "
              f"(log {fac2.refactor_log[-6:]}), "
              f"certs {fac2.cert_log[nc0:][-12:]}", flush=True)

    out = {
        "metric": "pegasus91_tpu",
        "n_patches": 91,
        "n_dofs_real": 8172,
        "n_dofs_padded": int(sys_.num_splines * sys_.stack.max_cp * 3),
        "backend": jax.default_backend(),
        "validation_rel_errs": errs,
        "warm_iteration_s": round(t_warm, 3),
        "warm_all_s": [round(x, 3) for x in times],
        "refactor_iteration_s": round(t_refac, 3),
        "cold_iteration_s": round(t_cold, 1),
        "slsqp": {"nit": int(res.nit), "wall_s": round(t_slsqp, 1),
                  "s_per_it": round(t_slsqp / nit, 2),
                  "n_refactor": n_refactor,
                  "J0": float(res.history[0]) if res.history else None,
                  "J_final": float(res.fun)},
        "gradient_parity_vs_cpu": errs["grad"],
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PEGASUS_TPU.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("WROTE", path, flush=True)


if __name__ == "__main__":
    main()
