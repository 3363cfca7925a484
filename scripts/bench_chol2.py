#!/usr/bin/env python
"""Split the factor cost: raw emulated-f64 matmul vs panel recursion,
and IR-sweep behavior per count."""
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


def rb(x):
    return float(jnp.asarray(x).ravel()[0])


def timeit(f, *a, n=3):
    f(*a)  # compile
    rb(f(*a))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        rb(f(*a))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    print("backend:", jax.default_backend(), flush=True)
    N, nb = 6656, 256
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.normal(size=(N, N)))
    Bm = jnp.asarray(rng.normal(size=(N, nb)))

    mm = jax.jit(lambda a, b: a @ b)
    t = timeit(mm, A, Bm)
    print(f"f64 (N,N)@(N,{nb}) matmul: {t*1e3:.1f} ms "
          f"-> {2*N*N*nb/t/1e12:.2f} Tflop/s(f64)", flush=True)
    # full trailing-update content of the factorization: N/nb of those
    print(f"  x {N//nb} panels = {t*(N//nb):.3f} s of trailing updates",
          flush=True)

    mmT = jax.jit(lambda a, b: a @ b.T)
    t2 = timeit(mmT, A, jnp.asarray(rng.normal(size=(nb, N))))
    print(f"f64 (N,N)@(nb,N).T matmul: {t2*1e3:.1f} ms", flush=True)

    # f32 comparison
    A32 = A.astype(jnp.float32); B32 = Bm.astype(jnp.float32)
    t3 = timeit(mm, A32, B32)
    print(f"f32 same matmul: {t3*1e3:.2f} ms -> "
          f"{2*N*N*nb/t3/1e12:.1f} Tflop/s(f32)", flush=True)

    # panel-only factorization cost (N = nb: one panel, no trailing)
    from goldfish_tpu.solver.tpu_cholesky import blocked_cholesky
    Kp = np.asarray(rng.normal(size=(nb, nb)))
    Kp = jnp.asarray(Kp @ Kp.T + nb * np.eye(nb))
    for mb in (16, 32):
        f = lambda K: blocked_cholesky(K, nb=nb, mb=mb)[0]
        t4 = timeit(f, Kp)
        print(f"panel-only chol nb={nb} mb={mb}: {t4*1e3:.1f} ms "
              f"-> x{N//nb} = {t4*(N//nb)*1e3:.0f} ms", flush=True)

    # IR sweeps on an equilibration-friendly SPD matrix (shell-like:
    # strong diagonal variation), cond ~1e12
    d = np.logspace(0, 6, N)  # K = D A0 D with modest-cond A0
    A0 = np.asarray(rng.normal(size=(N, N)))
    A0 = A0 @ A0.T / N + 3 * np.eye(N)
    K = jnp.asarray((A0 * d[:, None]) * d[None, :])
    b = jnp.asarray(rng.normal(size=N))
    from goldfish_tpu.solver.tpu_cholesky import DeviceCholesky
    dc = DeviceCholesky(nb=nb, mb=16).factor(K)
    t5 = timeit(lambda k: dc.factor(k)._L, K)
    print(f"factor of equilibratable K: {t5:.3f} s", flush=True)
    Kh = np.asarray(K)
    bh = np.asarray(b)
    for n_ir in (0, 1, 2, 3):
        x = np.asarray(dc.solve_ir(K, b, n_ir=n_ir) if n_ir else dc.solve(b))
        res = np.linalg.norm(Kh @ x - bh) / np.linalg.norm(bh)
        print(f"  n_ir={n_ir}: res {res:.2e}", flush=True)
    t6 = timeit(lambda k, v: dc.solve_ir(k, v, n_ir=2), K, b)
    print(f"solve_ir(2): {t6*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
