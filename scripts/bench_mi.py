#!/usr/bin/env python
"""MI-chain per-iteration hardware bench (round-2 verdict item #6).

Workload: one moving-intersection optimization iteration on the
T-beam MI system — design step on the web's CP net, implicit CP -> xi
solve, warm-started MI displacement solve, objective, and the FULL
adjoint dJ/d(amp) through both implicit solves (the chain of the
reference's flagship MI demos, e.g.
/root/reference/demos_om/shape_opt_mint/T-beam/T_beam_2patch_shopt_mi
.py:495-507, which the reference times with wall-clock prints).

The MI path amortizes ONE on-device f64 factorization across warm
iterations via PersistentDeviceFactorMI (solver/system_mi.py).

Run twice:
  GOLDFISH_MI_BENCH_CPU=1 python scripts/bench_mi.py  # CPU baseline
  python -u scripts/bench_mi.py                       # TPU + JSON

Writes MI_BENCH.json (repo root) in TPU mode.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("GOLDFISH_TPU_X64", "1")

import jax

CPU_MODE = os.environ.get("GOLDFISH_MI_BENCH_CPU") == "1"
if CPU_MODE:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from goldfish_tpu.config import use_x64

use_x64(True)

# the CPU baseline lives IN THE REPO: a /tmp reference vanished between
# the CPU and TPU runs once (round 3) and the TPU run silently paired
# itself with a stale partial baseline (8.39 s instead of 16.95 s)
REF = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "MI_BENCH_CPU.json")
NUM_EL = 40
P_DEG = 3
N_PTS = 17


def build():
    from goldfish_tpu.models import tbeam
    from goldfish_tpu.physics.coupling import InterfaceSpec
    from goldfish_tpu.solver.system_mi import MINonMatchingSystem

    w2 = tbeam.WIDTH / 2
    pts0 = [[-w2, 0, 0], [w2, 0, 0], [-w2, tbeam.LENGTH, 0],
            [w2, tbeam.LENGTH, 0]]
    pts1 = [[0, 0, 0], [0, 0, -tbeam.DEPTH], [0, tbeam.LENGTH, 0],
            [0, tbeam.LENGTH, -tbeam.DEPTH]]
    srf0 = tbeam.create_surf(pts0, max(NUM_EL // 2, 1), NUM_EL, P_DEG)
    srf1 = tbeam.create_surf(pts1, max((NUM_EL + 1) // 2, 1),
                             NUM_EL + 1, P_DEG)
    specs = [InterfaceSpec(
        pair=(0, 1),
        xi_ends_A=np.array([[0.5, 0.0], [0.5, 1.0]]),
        xi_ends_B=np.array([[0.0, 0.0], [0.0, 1.0]]),
        n_mortar_el=N_PTS - 1)]
    sys = MINonMatchingSystem([srf0, srf1], tbeam.E, tbeam.NU,
                              tbeam.H_TH, specs=specs,
                              n_pts_list=[N_PTS])
    sys.add_side_bc(0, direction=1, side=0, n_layers=1)
    sys.add_side_bc(1, direction=1, side=0, n_layers=1)
    sys.add_point_load(0, [1.0, 1.0], [0.0, 0.0, 10.0])
    return sys


def force(*xs):
    return float(sum(jnp.asarray(x).ravel()[0] for x in xs))


def main():
    from goldfish_tpu.geometry.cpiga2xi import _c2x_adjoint
    from goldfish_tpu.physics import kl_shell
    from goldfish_tpu.solver.linalg import mode as _mode
    from goldfish_tpu.solver.system_mi import (
        PersistentDeviceFactorMI,
        adjoint_solve_mi,
        newton_solve_mi,
        newton_solve_mi_host,
    )

    # baseline provenance (round-3 verdict #8): the contended-baseline
    # episode (a CPU baseline timed while another job held the single
    # core read 60% slow) must be structurally impossible to repeat —
    # record load at start and REFUSE to write a contended CPU baseline
    import socket

    try:
        load0 = os.getloadavg()[0]
    except OSError:
        load0 = -1.0
    contended = bool(load0 > 0.5)
    provenance = {"host": socket.gethostname(),
                  "date": time.strftime("%Y-%m-%dT%H:%M:%S"),
                  "load_at_start": round(load0, 2),
                  "contended": contended}
    if CPU_MODE and contended:
        print(f"REFUSING to record a CPU baseline at load {load0:.2f} "
              "on a 1-core host (check `ps`, rerun uncontended)",
              flush=True)
        return 1

    print("backend:", jax.default_backend(), flush=True)
    sys_ = build()
    n_dofs = sum(m.n_cp for m in sys_.metas) * 3
    print(f"MI t-beam: {sys_.num_splines} patches, {n_dofs} dofs",
          flush=True)
    data, mi, co, ss = sys_.data, sys_.mi, sys_.co, sys_.ss
    pdeg, qdeg = sys_.pdeg, sys_.qdeg
    c2x = sys_.c2x
    h = sys_.h_init
    m = sys_.metas[1]
    gv = sys_.surfs[1].greville_points(1)
    bend = jnp.asarray(np.tile(np.sin(np.pi * gv)[None, :],
                               (m.n_u, 1)).ravel())

    # The PRODUCTION adjoint pipeline, composed from jitted kernels
    # (args-only; no outer jit — axon f64 closure hazard): the
    # jax.grad-over-eager-chain variant is algorithmically identical
    # but pays ~27 ms tunnel latency for every one of the hundreds of
    # small transpose dispatches in the eager backward sweep (+7 s/it
    # measured; scripts/profile_mi.py has the stage budget).
    from goldfish_tpu.opt.warmstart import SecantWarmStart

    mixed = _mode() == "mixed"
    fac = PersistentDeviceFactorMI(data, mi, co, ss, pdeg, qdeg) \
        if mixed else None
    # secant-extrapolated warm starts (opt/warmstart.py): entry
    # residuals become second-order in the design step, so warm solves
    # converge in 0-1 Newton iterations instead of 2
    ws_d = SecantWarmStart()
    ws_xi = SecantWarmStart()
    ws_lam = SecantWarmStart()  # seeds the adjoint IR solve
    # cross-solve amortization state, exactly as the production
    # build_solve_fn_mi closure maintains it: the residual-floor hint
    # stops warm solves at the floor the previous solve reached
    # (instead of burning 3 stall-detection iterations) and the shared
    # dict caches the load-scale convergence reference |r(0)|
    floor_hint = [1e-14]
    shared = {}
    energy_vg = jax.jit(jax.value_and_grad(
        kl_shell.internal_energy, argnums=(1, 2)))

    @jax.jit
    def make_cp(amp):
        return sys_.cp.at[1, : m.n_cp, 0].add(amp * bend)

    @jax.jit
    def chain_amp(g_cp_total):
        return jnp.sum(g_cp_total[1, : m.n_cp, 0] * bend)

    def opt_iteration(amp, d0, xi0):
        cp = make_cp(amp)
        xi_seed = ws_xi.predict(amp, xi0)
        if xi_seed is not None:
            # clamp an overshooting secant seed to the parametric
            # domain (see operations/disp_mi_imop.solve_nonlinear)
            xi_seed = jnp.clip(xi_seed, 0.0, 1.0)
        xi = c2x.solve(cp, xi_seed)
        d0 = ws_d.predict(amp, d0)
        if mixed:
            d, its, rn = newton_solve_mi_host(
                data, mi, co, ss, pdeg, qdeg, cp, h, xi, d0,
                rtol=1e-9, atol=floor_hint[0], device_fac=fac,
                shared=shared)
            if its < 30:
                floor_hint[0] = max(1e-14, 1.5 * rn)
        else:
            d, _, _ = newton_solve_mi(data, mi, co, ss, pdeg, qdeg,
                                      cp, h, xi, d0, rtol=1e-9)
        ws_xi.update(amp, xi)
        ws_d.update(amp, d)
        J, (g_d, g_cp) = energy_vg(sys_.stack, d, cp, h, sys_.E,
                                   sys_.nu)
        dcp_a, _, dxi_a = adjoint_solve_mi(
            data, mi, co, ss, pdeg, qdeg, d, cp, h, xi, g_d,
            device_fac=fac, lam_ws=ws_lam)
        dcp_xi = _c2x_adjoint(c2x.ss, c2x.mi, cp, xi, dxi_a,
                              p=c2x.p, q=c2x.q)
        g_amp = chain_amp(g_cp + dcp_a + dcp_xi)
        return J, d, xi, g_amp

    # compile + cold solve
    t0 = time.perf_counter()
    J, d, xi, g = opt_iteration(jnp.asarray(0.05),
                                sys_.zero_displacement(), None)
    force(J, d, g)
    t_cold = time.perf_counter() - t0

    # untimed warm-up: optimizer-sized steps over BOTH signs and
    # several deltas (same rationale as bench.py's wing warm-up) so
    # the one-shot steady-state transients land OUTSIDE the timed
    # loop — the rho-aware entry refresh (one refactorization at the
    # first warm entry after a cold solve), the one-time XLA compiles
    # of whatever n_ir sweep-menu variants the adaptive policy picks
    # (~2 min each through the axon remote-compile tunnel on a cold
    # persistent cache), and the FIRST-IN-PROCESS LOADS of already-
    # cached program variants (~15-18 s each through the tunnel:
    # scripts/diag_mi_stages.py measured two timed adjoints at
    # 16.4/17.9 s with zero refactorizations and healthy certificates
    # — pure program-load cost; a 2-step warm-up did not sample the
    # seeded/unseeded n_ir combinations the timed loop's rho/seed
    # trajectory picks)
    for dh in (-1e-3, -2e-3, 5e-4, 2.5e-4, -5e-4):
        amp = 0.05 * (1.0 + dh)
        J, d, xi, g = opt_iteration(jnp.asarray(amp), d, xi)
        force(J, d, g)

    # deterministic belt-and-braces on top of the sampling above:
    # force-load EVERY sweep-menu variant (dir/unseeded/seeded x n_ir)
    # so no first-in-process program load can land in the timed loop
    # regardless of the rho/seed trajectory it picks
    if mixed and getattr(fac, "_ref", None) is not None:
        fac.preload()
        # re-load the factorization ladder untimed: preload's program
        # loads can evict it from the device program cache and the next
        # refactor then pays the ladder re-load inside the timed loop
        # (round-5 pegasus evtrace finding; see bench.py)
        fac.ensure(*fac._ref, force=True, why="post-preload-reload")
        fac.prepare(*fac._ref)

    times = []
    for k in range(5):
        amp = 0.05 * (1.0 + 1e-3 * (k + 1))
        t0 = time.perf_counter()
        J, d, xi, g = opt_iteration(jnp.asarray(amp), d, xi)
        force(J, d, g)
        times.append(time.perf_counter() - t0)
    times.sort()
    t = times[len(times) // 2]
    print(f"cold {t_cold:.2f}s, warm {t:.3f}s/it "
          f"(all {[round(x, 3) for x in times]}), J={float(J):.6e}, "
          f"dJ/damp={float(g):.6e}", flush=True)
    if fac is not None:
        # amortization diagnostics: steady state should show ZERO
        # refactorizations after the cold solve and passing pipelined
        # certificates (tags *-pipe); anything else explains a warm-
        # time regression
        print(f"refactor_log: {fac.refactor_log}", flush=True)
        print(f"cert_log tail: {fac.cert_log[-12:]}", flush=True)

    if CPU_MODE:
        with open(REF, "w") as f:
            json.dump({"warm_s": t, "J": float(J), "g": float(g),
                       "provenance": provenance,
                       "n_samples": len(times)}, f)
        print("cpu baseline written:", REF, flush=True)
        return

    cpu = json.load(open(REF)) if os.path.exists(REF) else None
    out = {
        "metric": "mi_tbeam_opt_iteration_wall",
        "value": round(t, 4),
        "unit": "s",
        "n_dofs": n_dofs,
        "backend": jax.default_backend(),
        "all_times": [round(x, 4) for x in times],
        "cold_s": round(t_cold, 2),
        "provenance": provenance,
        "n_samples": len(times),
    }
    if cpu:
        out["cpu_baseline_s"] = round(cpu["warm_s"], 4)
        out["vs_cpu"] = round(cpu["warm_s"] / t, 2)
        out["grad_parity_vs_cpu"] = abs(float(g) - cpu["g"]) / abs(cpu["g"])
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "MI_BENCH.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("WROTE", path, json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
