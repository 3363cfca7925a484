#!/usr/bin/env python
"""Is the warm-path physics program latency-bound or compute-bound?

Times the fused residual+potential program (_jit_res_pot — the thing a
warm bench iteration runs 2-4x) on the real TPU at three wing
resolutions. If wall time is ~flat in n_qp, the program is
op-count/latency-bound (XLA emulated-f64 chains of small tensors) and a
fused Pallas two-f32 kernel over quadrature points would attack the
right term; if it scales ~linearly, we are at the 0.84 Tflop/s
emulated-f64 roof and a hand kernel buys nothing (ROADMAP item 0).

Run on hardware: python -u scripts/scaling_residual.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("GOLDFISH_TPU_X64", "1")

import jax
import jax.numpy as jnp

from goldfish_tpu.config import use_x64

use_x64(True)

from goldfish_tpu.models import wing
from goldfish_tpu.solver.implicit import _jit_res_pot, _jit_residual_vjp


def rb(*xs):
    return float(sum(jnp.asarray(x).ravel()[0] for x in xs))


def main():
    print("backend:", jax.default_backend(), flush=True)
    for num_el in (3, 6, 9):
        sys_ = wing.build(num_el=num_el, p=3)
        data, cp, h = sys_.data, sys_.cp, sys_.h_init
        d = sys_.zero_displacement()
        n_qp = int(sys_.stack.wq.shape[1]) * 16 * sys_.num_splines
        # warm up (compile)
        t0 = time.perf_counter()
        r, rn, Pi = _jit_res_pot(data, cp, h, d)
        rb(r, rn, Pi)
        t_compile = time.perf_counter() - t0
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            r, rn, Pi = _jit_res_pot(data, cp, h, d)
            rb(r, rn, Pi)
            ts.append(time.perf_counter() - t0)
        ts.sort()
        # the adjoint vjp program (dR/d(cp,h)^T lam) for the same state
        lam = r
        t0 = time.perf_counter()
        dcp, dh = _jit_residual_vjp(data, d, cp, h, lam)
        rb(dcp, dh)
        t_vjp_compile = time.perf_counter() - t0
        tv = []
        for _ in range(3):
            t0 = time.perf_counter()
            dcp, dh = _jit_residual_vjp(data, d, cp, h, lam)
            rb(dcp, dh)
            tv.append(time.perf_counter() - t0)
        tv.sort()
        print(f"num_el={num_el}: n_qp~{n_qp} n_dofs={sys_.num_splines * sys_.stack.max_cp * 3} "
              f"res_pot median {ts[len(ts)//2]*1e3:.1f} ms (compile {t_compile:.1f}s) "
              f"vjp median {tv[len(tv)//2]*1e3:.1f} ms (compile {t_vjp_compile:.1f}s)",
              flush=True)


if __name__ == "__main__":
    main()
