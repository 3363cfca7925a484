#!/usr/bin/env python
"""Per-stage, UNSORTED attribution of the MI bench timed loop.

MI_BENCH.json's median hides that two of the five timed iterations
cost ~20+ s (pre-existing; identical across reruns, so not compiles).
This reruns the exact bench_mi workload with wall timers around each
stage (xi solve, displacement solve, energy, adjoint, xi-adjoint) and
prints every iteration in order, plus Newton iteration counts and the
factor event deltas — to find where those 20 s go.
"""
import os
import sys
import time

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_here))
sys.path.insert(0, _here)
os.environ.setdefault("GOLDFISH_TPU_X64", "1")

import jax
import jax.numpy as jnp
import numpy as np

from goldfish_tpu.config import use_x64

use_x64(True)

from bench_mi import build, force  # noqa: E402


def main():
    from goldfish_tpu.geometry.cpiga2xi import _c2x_adjoint
    from goldfish_tpu.opt.warmstart import SecantWarmStart
    from goldfish_tpu.physics import kl_shell
    from goldfish_tpu.solver.system_mi import (
        PersistentDeviceFactorMI,
        adjoint_solve_mi,
        newton_solve_mi_host,
    )

    print("backend:", jax.default_backend(), flush=True)
    sys_ = build()
    data, mi, co, ss = sys_.data, sys_.mi, sys_.co, sys_.ss
    pdeg, qdeg = sys_.pdeg, sys_.qdeg
    c2x = sys_.c2x
    h = sys_.h_init
    m = sys_.metas[1]
    gv = sys_.surfs[1].greville_points(1)
    bend = jnp.asarray(np.tile(np.sin(np.pi * gv)[None, :],
                               (m.n_u, 1)).ravel())

    fac = PersistentDeviceFactorMI(data, mi, co, ss, pdeg, qdeg)
    ws_d = SecantWarmStart()
    ws_xi = SecantWarmStart()
    ws_lam = SecantWarmStart()
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

    def opt_iteration(amp, d0, xi0, stages=None):
        def tick(tag, t0):
            if stages is not None:
                stages.append((tag, time.perf_counter() - t0))
            return time.perf_counter()

        t = time.perf_counter()
        cp = make_cp(amp)
        xi_seed = ws_xi.predict(amp, xi0)
        if xi_seed is not None:
            xi_seed = jnp.clip(xi_seed, 0.0, 1.0)
        xi = c2x.solve(cp, xi_seed)
        force(xi)
        t = tick("xi_solve", t)
        d0 = ws_d.predict(amp, d0)
        nf0, nc0 = fac.n_factor, len(fac.cert_log)
        d, its, rn = newton_solve_mi_host(
            data, mi, co, ss, pdeg, qdeg, cp, h, xi, d0,
            rtol=1e-9, atol=floor_hint[0], device_fac=fac,
            shared=shared)
        if its < 30:
            floor_hint[0] = max(1e-14, 1.5 * rn)
        force(d)
        t = tick(f"d_solve[{its}its,refac+{fac.n_factor - nf0},"
                 f"certs+{len(fac.cert_log) - nc0}]", t)
        ws_xi.update(amp, xi)
        ws_d.update(amp, d)
        J, (g_d, g_cp) = energy_vg(sys_.stack, d, cp, h, sys_.E,
                                   sys_.nu)
        force(J)
        t = tick("energy_vg", t)
        nf0, nc0 = fac.n_factor, len(fac.cert_log)
        dcp_a, _, dxi_a = adjoint_solve_mi(
            data, mi, co, ss, pdeg, qdeg, d, cp, h, xi, g_d,
            device_fac=fac, lam_ws=ws_lam)
        force(dcp_a)
        t = tick(f"adjoint[refac+{fac.n_factor - nf0},"
                 f"certs+{len(fac.cert_log) - nc0}]", t)
        dcp_xi = _c2x_adjoint(c2x.ss, c2x.mi, cp, xi, dxi_a,
                              p=c2x.p, q=c2x.q)
        g_amp = chain_amp(g_cp + dcp_a + dcp_xi)
        force(g_amp)
        tick("xi_adjoint+chain", t)
        return float(J), d, xi, float(g_amp)

    t0 = time.perf_counter()
    J, d, xi, g = opt_iteration(jnp.asarray(0.05),
                                sys_.zero_displacement(), None)
    print(f"cold {time.perf_counter() - t0:.1f}s", flush=True)
    for k in range(2):
        amp = 0.05 * (1.0 - 1e-3 * (k + 1))
        J, d, xi, g = opt_iteration(jnp.asarray(amp), d, xi)

    for k in range(5):
        amp = 0.05 * (1.0 + 1e-3 * (k + 1))
        stages = []
        t0 = time.perf_counter()
        J, d, xi, g = opt_iteration(jnp.asarray(amp), d, xi,
                                    stages=stages)
        wall = time.perf_counter() - t0
        print(f"iter {k}: {wall:7.3f}s  J={J:.6e} g={g:.6e}",
              flush=True)
        for tag, dt in stages:
            if dt > 0.05:
                print(f"    {tag:40s} {dt:7.3f}s", flush=True)
    print("refactor_log:", fac.refactor_log, flush=True)


if __name__ == "__main__":
    main()
