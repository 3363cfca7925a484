#!/usr/bin/env python
"""Axon-backend validation of the blocked Cholesky variants vs a host
oracle (CLAUDE.md: validate every new device program before trusting
it — fused programs can silently corrupt on axon)."""
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


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    N = 6600
    d = np.logspace(0, 6, N)
    A0 = rng.normal(size=(N, N))
    A0 = A0 @ A0.T / N + 3 * np.eye(N)
    K = (A0 * d[:, None]) * d[None, :]
    Kd = jnp.asarray(K)
    b = rng.normal(size=N)
    bd = jnp.asarray(b)
    x_ref = np.linalg.solve(K, b)

    for unrolled in (False, True):
        dc = DeviceCholesky(nb=256, mb=16, unrolled=unrolled)
        t0 = time.perf_counter()
        dc.factor(Kd)
        float(dc._L[0, 0])
        t_compile = time.perf_counter() - t0
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            dc.factor(Kd)
            float(dc._L[0, 0])
            ts.append(time.perf_counter() - t0)
        # factor quality vs host: ||L L^T - Keq|| on a sample block
        Lh = np.asarray(dc._L)
        dsc = np.asarray(dc._dscale)
        Keq = K * dsc[:, None] * dsc[None, :]
        Npad = Lh.shape[0]
        Keq_p = np.eye(Npad)
        Keq_p[:N, :N] = Keq
        back = np.linalg.norm(Lh @ Lh.T - Keq_p) / np.linalg.norm(Keq_p)
        x0 = np.asarray(dc.solve(bd))
        res0 = np.linalg.norm(K @ x0 - b) / np.linalg.norm(b)
        x2 = np.asarray(dc.solve_ir(Kd, bd, n_ir=2))
        res2 = np.linalg.norm(K @ x2 - b) / np.linalg.norm(b)
        err2 = np.linalg.norm(x2 - x_ref) / np.linalg.norm(x_ref)
        print(f"unrolled={unrolled}: factor {min(ts):.3f}s (compile "
              f"{t_compile:.0f}s) backward {back:.2e} res0 {res0:.2e} "
              f"res_ir2 {res2:.2e} err_ir2 {err2:.2e}", flush=True)


if __name__ == "__main__":
    main()
