#!/usr/bin/env python
"""Diagnose the warm-loop MI direction certificates (round-3 MI bench
regression): after the entry pipeline commits the Woodbury seam
correction, the fused IR direction should contract at ~1e-3/sweep
(fresh-factor grade); the bench measures rho ~0.26. Reproduce at small
scale, then compare dir certificates with (a) the committed V, (b)
V=0, (c) a fresh factor at the current state."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("GOLDFISH_TPU_X64", "1")
os.environ["GOLDFISH_TPU_LINEAR"] = "mixed"

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from goldfish_tpu.config import use_x64

use_x64(True)

NUM_EL = 16
P_DEG = 3
N_PTS = 11


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
    sys_ = MINonMatchingSystem([srf0, srf1], tbeam.E, tbeam.NU,
                               tbeam.H_TH, specs=specs,
                               n_pts_list=[N_PTS])
    sys_.add_side_bc(0, direction=1, side=0, n_layers=1)
    sys_.add_side_bc(1, direction=1, side=0, n_layers=1)
    sys_.add_point_load(0, [1.0, 1.0], [0.0, 0.0, 10.0])
    return sys_


def main():
    from goldfish_tpu.solver.system_mi import (
        PersistentDeviceFactorMI,
        _jit_dir_mi_wb,
        newton_solve_mi_host,
        residual_mi,
    )

    sys_ = build()
    data, mi, co, ss = sys_.data, sys_.mi, sys_.co, sys_.ss
    p, q = sys_.pdeg, sys_.qdeg
    c2x = sys_.c2x
    h = sys_.h_init
    m = sys_.metas[1]
    gv = sys_.surfs[1].greville_points(1)
    bend = jnp.asarray(np.tile(np.sin(np.pi * gv)[None, :],
                               (m.n_u, 1)).ravel())

    def make_cp(amp):
        return sys_.cp.at[1, : m.n_cp, 0].add(amp * bend)

    fac = PersistentDeviceFactorMI(data, mi, co, ss, p, q)
    shared = {}

    # cold solve at amp=0.05
    cp = make_cp(0.05)
    xi = c2x.solve(cp)
    d, its, rn = newton_solve_mi_host(data, mi, co, ss, p, q, cp, h,
                                      xi, sys_.zero_displacement(),
                                      rtol=1e-9, device_fac=fac,
                                      shared=shared)
    print(f"cold: its={its} rn={rn:.3e} n_factor={fac.n_factor}",
          flush=True)

    # two warm design steps like the bench
    for k in range(2):
        amp = 0.05 * (1.0 + 1e-3 * (k + 1))
        cp = make_cp(amp)
        xi = c2x.solve(cp, xi)
        d, its, rn = newton_solve_mi_host(data, mi, co, ss, p, q, cp,
                                          h, xi, d, rtol=1e-9,
                                          device_fac=fac, shared=shared)
        print(f"warm {k}: its={its} rn={rn:.3e} "
              f"n_factor={fac.n_factor}", flush=True)
    print("refactor_log:", fac.refactor_log, flush=True)
    print("cert_log:", [(t, n, f"{r:.2e}") for t, n, r in fac.cert_log],
          flush=True)

    # Now the experiment: third design step, entry state, compare the
    # direction certificates under different preconditioner states.
    amp = 0.05 * (1.0 + 3e-3)
    cp = make_cp(amp)
    xi = c2x.solve(cp, xi)
    r = residual_mi(data, mi, co, ss, p, q, d, cp, h, xi)

    def dir_cert(V, n_ir, label):
        _, ratio, _ = _jit_dir_mi_wb(
            data, mi, co, ss, fac.dc._L, fac.dc._invs, fac.dc._dscale,
            fac._Uoh, V, cp, h, xi, d, r, p=p, q=q, nb=fac.dc.nb,
            n_ir=n_ir)
        print(f"  {label}: n={n_ir} ratio={float(ratio):.3e}",
              flush=True)
        return float(ratio)

    print("\n-- entry state (factor from warm loop, xi moved 1e-3) --",
          flush=True)
    print(f"drift = {float(fac.drift_scalar(cp, h, xi, d)):.3e}",
          flush=True)
    dir_cert(fac._V, 2, "committed V (stale xi)")
    pend = fac.prepare_async(cp, h, xi, d)
    if pend is None:
        print("  prepare_async: cache hit (no new V)", flush=True)
        Vnew = fac._V
    else:
        Vnew = pend[0]
        print(f"  prepare_async same={bool(pend[1])}", flush=True)
    dir_cert(Vnew, 2, "fresh V @ current xi")
    dir_cert(jnp.zeros_like(fac._V), 2, "V = 0")
    for n in (2, 4, 6):
        dir_cert(Vnew, n, f"fresh V, n={n}")
    # fresh factor at the current state
    fac.ensure(cp, h, xi, d, force=True, why="diag")
    dir_cert(fac._V, 2, "fresh FACTOR")
    dir_cert(fac._V, 4, "fresh FACTOR n=4")


if __name__ == "__main__":
    main()
