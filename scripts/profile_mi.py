#!/usr/bin/env python
"""Stage-level profile of the warm MI opt iteration on hardware."""
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

from scripts.bench_mi import build  # noqa: E402


def force(*xs):
    return float(sum(jnp.asarray(x).ravel()[0] for x in xs))


def main():
    from goldfish_tpu.physics import kl_shell
    from goldfish_tpu.solver.system_mi import (
        PersistentDeviceFactorMI,
        _jit_res_vjp_mi,
        _jit_residual_mi,
        newton_solve_mi_host,
    )

    print("backend:", jax.default_backend(), flush=True)
    sys_ = build()
    data, mi, co, ss = sys_.data, sys_.mi, sys_.co, sys_.ss
    p, q = sys_.pdeg, sys_.qdeg
    c2x = sys_.c2x
    cp = sys_.cp
    h = sys_.h_init

    def t(label, fn, n=3):
        fn()  # warm
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        print(f"{label}: {min(ts):.3f}s", flush=True)
        return min(ts)

    # cold chain once
    xi = c2x.solve(cp)
    fac = PersistentDeviceFactorMI(data, mi, co, ss, p, q)
    d, it, rn = newton_solve_mi_host(data, mi, co, ss, p, q, cp, h, xi,
                                     sys_.zero_displacement(),
                                     rtol=1e-9, device_fac=fac)
    print(f"cold newton: {int(it)} its |r|={rn:.2e}", flush=True)

    t("xi solve (warm start)", lambda: force(c2x.solve(cp, xi)))
    t("xi solve (cold start)", lambda: force(c2x.solve(cp)))
    t("newton_mi_host (warm)", lambda: force(newton_solve_mi_host(
        data, mi, co, ss, p, q, cp, h, xi, d, rtol=1e-9,
        device_fac=fac)[0]))
    t("residual_mi", lambda: force(_jit_residual_mi(
        data, mi, co, ss, p, q, cp, h, xi, d)))
    g = _jit_residual_mi(data, mi, co, ss, p, q, cp, h, xi, d)
    t("exact_solve (jvp-IR)", lambda: force(fac.exact_solve(
        cp, h, xi, d, g)))
    t("res vjp (cp,h,xi)", lambda: force(*_jit_res_vjp_mi(
        data, mi, co, ss, p, q, d, cp, h, xi, g)))
    t("K_mi assemble+factor", lambda: fac.ensure(cp, h, xi, d,
                                                 force=True) or None,
      n=2)
    t("J eval", lambda: force(kl_shell.internal_energy(
        sys_.stack, d, cp, h, sys_.E, sys_.nu)))


if __name__ == "__main__":
    main()
