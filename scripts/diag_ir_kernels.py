#!/usr/bin/env python
"""Per-call wall of the three IR kernels at pegasus scale, repeated
back-to-back: discriminates per-call program RELOAD (every call ~15 s)
from genuine device wall (repeats fast). Round-5 adjoint-pipe
attribution (the serialized trace showed ~17 s solves independent of
n_ir while the same-math direction kernel runs 0.7-3.4 s)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("GOLDFISH_TPU_X64", "1")
import jax
import jax.numpy as jnp
from goldfish_tpu.config import use_x64
use_x64(True)
from scripts.pegasus_tpu import build, force

def main():
    from goldfish_tpu.solver import devicechol
    from goldfish_tpu.solver.devicechol import (
        _jvp_ir_dir, _jvp_ir_solve, _jvp_ir_solve_seeded)
    sys_, th = build()
    data = sys_.data
    cp = sys_.cp
    h = sys_.h_init
    fac = devicechol.PersistentDeviceFactor(data)
    d = sys_.zero_displacement()
    t0=time.perf_counter(); fac.ensure(cp, h, d, force=True)
    print(f"factor {time.perf_counter()-t0:.1f}s", flush=True)
    b = jnp.asarray(data.free, dtype=cp.dtype)
    L, invs, dsc, nb = fac.dc._L, fac.dc._invs, fac.dc._dscale, fac.dc.nb
    def timed(tag, fn):
        for k in range(3):
            t0 = time.perf_counter()
            out = fn()
            jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
            print(f"{tag} call{k}: {time.perf_counter()-t0:.2f}s", flush=True)
    for n in (2, 4):
        timed(f"dir n={n}", lambda n=n: _jvp_ir_dir(
            data, L, invs, dsc, cp, h, d, b, nb=nb, n_ir=n))
        timed(f"solve n={n}", lambda n=n: _jvp_ir_solve(
            data, L, invs, dsc, cp, h, d, b, nb=nb, n_ir=n))
        timed(f"seeded n={n}", lambda n=n: _jvp_ir_solve_seeded(
            data, L, invs, dsc, cp, h, d, b, b*0.0, nb=nb, n_ir=n))
    # alternation test: does switching kernels evict?
    for k in range(2):
        timed(f"alt dir n=2 r{k}", lambda: _jvp_ir_dir(
            data, L, invs, dsc, cp, h, d, b, nb=nb, n_ir=2))
        timed(f"alt seeded n=2 r{k}", lambda: _jvp_ir_solve_seeded(
            data, L, invs, dsc, cp, h, d, b, b*0.0, nb=nb, n_ir=2))

if __name__ == "__main__":
    main()
