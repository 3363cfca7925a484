#!/usr/bin/env python
"""TPU microbenchmark of the micro-blocked f64 Cholesky (+ fused IR)
at bench scale, vs a host f64 oracle. Forced-readback timing."""
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

from goldfish_tpu.solver.tpu_cholesky import DeviceCholesky


def rb(x):
    return float(jnp.asarray(x).ravel()[0])


def main():
    print("backend:", jax.default_backend(), flush=True)
    N = 6600
    rng = np.random.default_rng(0)
    Q, _ = np.linalg.qr(rng.normal(size=(N, N)))
    K = (Q * np.logspace(-12, 0, N)) @ Q.T
    K = 0.5 * (K + K.T)
    b = rng.normal(size=N)
    x_ref = np.linalg.solve(K, b)
    Kd = jnp.asarray(K)
    bd = jnp.asarray(b)

    for nb, mb in [(256, 16), (256, 32), (512, 32), (128, 16)]:
        dc = DeviceCholesky(nb=nb, mb=mb)
        t0 = time.perf_counter()
        dc.factor(Kd); rb(dc._L)
        t_compile = time.perf_counter() - t0
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            dc.factor(Kd); rb(dc._L)
            ts.append(time.perf_counter() - t0)
        t_fac = min(ts)
        t0 = time.perf_counter()
        x = dc.solve_ir(Kd, bd, n_ir=3); rb(x)
        t_sol_c = time.perf_counter() - t0
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            x = dc.solve_ir(Kd, bd, n_ir=3); rb(x)
            ts.append(time.perf_counter() - t0)
        t_sol = min(ts)
        err = float(np.linalg.norm(np.asarray(x) - x_ref)
                    / np.linalg.norm(x_ref))
        res = float(np.linalg.norm(K @ np.asarray(x) - b)
                    / np.linalg.norm(b))
        print(f"nb={nb} mb={mb}: factor {t_fac:.3f}s (compile "
              f"{t_compile:.1f}s) solve_ir3 {t_sol:.3f}s (compile "
              f"{t_sol_c:.1f}s) relerr {err:.2e} res {res:.2e}",
              flush=True)


if __name__ == "__main__":
    main()
