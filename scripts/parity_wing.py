#!/usr/bin/env python
"""Hardware gradient-parity measurement at bench scale (BASELINE.md:
dJ/dp relative parity <= 1e-6 vs the CPU/f64 run of the identical
workload). Run twice:

  GOLDFISH_PARITY_CPU=1 python scripts/parity_wing.py   # writes ref
  python scripts/parity_wing.py                          # TPU + compare
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("GOLDFISH_TPU_X64", "1")

import jax

if os.environ.get("GOLDFISH_PARITY_CPU") == "1":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from goldfish_tpu.config import use_x64

use_x64(True)

REF = "/tmp/parity_wing_ref.npz"


def main():
    from goldfish_tpu.design.pipeline import ThicknessFFD
    from goldfish_tpu.models import wing
    from goldfish_tpu.physics import kl_shell
    from goldfish_tpu.solver.implicit import build_solve_fn

    print("backend:", jax.default_backend(), flush=True)
    sys_ = wing.build(num_el=6, p=3)
    th = ThicknessFFD(sys_, num_els=(4, 4, 1), p=(2, 2, 1))
    solve = build_solve_fn(sys_.data, rtol=1e-9, max_it=30)
    cp = sys_.cp

    def opt_iteration(h_ffd, d0):
        h = th(h_ffd)
        d = solve(cp, h, d0)
        J = kl_shell.internal_energy(sys_.stack, d, cp, h, sys_.E,
                                     sys_.nu)
        return J, d

    vg = jax.value_and_grad(opt_iteration, has_aux=True)
    h0 = jnp.asarray(th.init_h_ffd(wing.H_TH))
    d0 = sys_.zero_displacement()
    (J, d), g = vg(h0, d0)
    # warm iteration (the benched workload)
    hk = h0 * (1.0 + 1e-4)
    (Jk, dk), gk = vg(hk, d)
    J, Jk = float(J), float(Jk)
    g = np.asarray(g)
    gk = np.asarray(gk)
    print(f"J={J:.12e} Jk={Jk:.12e} |g|={np.linalg.norm(gk):.6e}",
          flush=True)

    if os.environ.get("GOLDFISH_PARITY_CPU") == "1":
        np.savez(REF, J=J, Jk=Jk, g=g, gk=gk)
        print("reference written:", REF, flush=True)
        return
    ref = np.load(REF)
    rel_g = np.linalg.norm(gk - ref["gk"]) / np.linalg.norm(ref["gk"])
    rel_J = abs(Jk - float(ref["Jk"])) / abs(float(ref["Jk"]))
    print(f"PARITY: dJ/dp rel {rel_g:.3e}  J rel {rel_J:.3e}",
          flush=True)


if __name__ == "__main__":
    main()
