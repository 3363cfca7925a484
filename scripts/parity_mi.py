#!/usr/bin/env python
"""Hardware MI full-chain parity (CP -> xi -> d -> J): TPU vs CPU.

Run twice:
  GOLDFISH_PARITY_CPU=1 python scripts/parity_mi.py   # reference
  python scripts/parity_mi.py                          # TPU + compare
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

REF = "/tmp/parity_mi_ref.npz"


def build(num_el=6, p=3, n_pts=17):
    from goldfish_tpu.models import tbeam
    from goldfish_tpu.physics.coupling import InterfaceSpec
    from goldfish_tpu.solver.system_mi import MINonMatchingSystem

    w2 = tbeam.WIDTH / 2
    pts0 = [[-w2, 0, 0], [w2, 0, 0], [-w2, tbeam.LENGTH, 0],
            [w2, tbeam.LENGTH, 0]]
    pts1 = [[0, 0, 0], [0, 0, -tbeam.DEPTH], [0, tbeam.LENGTH, 0],
            [0, tbeam.LENGTH, -tbeam.DEPTH]]
    srf0 = tbeam.create_surf(pts0, max(num_el // 2, 1), num_el, p)
    srf1 = tbeam.create_surf(pts1, max((num_el + 1) // 2, 1),
                             num_el + 1, p)
    specs = [InterfaceSpec(
        pair=(0, 1),
        xi_ends_A=np.array([[0.5, 0.0], [0.5, 1.0]]),
        xi_ends_B=np.array([[0.0, 0.0], [0.0, 1.0]]),
        n_mortar_el=n_pts - 1)]
    sys = MINonMatchingSystem([srf0, srf1], tbeam.E, tbeam.NU,
                              tbeam.H_TH, specs=specs,
                              n_pts_list=[n_pts])
    sys.add_side_bc(0, direction=1, side=0, n_layers=1)
    sys.add_side_bc(1, direction=1, side=0, n_layers=1)
    sys.add_point_load(0, [1.0, 1.0], [0.0, 0.0, 10.0])
    return sys


def main():
    from goldfish_tpu.physics import kl_shell

    print("backend:", jax.default_backend(), flush=True)
    sys_ = build()
    forward = sys_.build_forward(rtol=1e-10, max_it=25)
    d0 = sys_.zero_displacement()
    m = sys_.metas[1]
    gv = sys_.surfs[1].greville_points(1)
    bend = jnp.asarray(np.tile(np.sin(np.pi * gv)[None, :],
                               (m.n_u, 1)).ravel())

    def J(amp):
        cp = sys_.cp.at[1, : m.n_cp, 0].add(amp * bend)
        d, xi = forward(cp, sys_.h_init, d0)
        return kl_shell.internal_energy(sys_.stack, d, cp, sys_.h_init,
                                        sys_.E, sys_.nu)

    amp0 = jnp.asarray(0.05)
    g = float(jax.grad(J)(amp0))
    Jv = float(J(amp0))
    print(f"J={Jv:.12e} dJ/damp={g:.12e}", flush=True)
    if os.environ.get("GOLDFISH_PARITY_CPU") == "1":
        np.savez(REF, J=Jv, g=g)
        print("reference written", flush=True)
        return
    ref = np.load(REF)
    rel_g = abs(g - float(ref["g"])) / abs(float(ref["g"]))
    rel_J = abs(Jv - float(ref["J"])) / abs(float(ref["J"]))
    print(f"MI PARITY: dJ rel {rel_g:.3e}  J rel {rel_J:.3e}", flush=True)


if __name__ == "__main__":
    main()
