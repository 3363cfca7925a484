#!/usr/bin/env python
"""Axon-backend validation of the STRUCTURED jet-Hessian device
program vs a host (numpy-side) oracle at bench scale (CLAUDE.md:
validate every new device program against a host oracle before
trusting it — gather-heavy / fused f64 programs have silently
corrupted on axon before).

The structured element_hessians (physics/kl_shell.py) replaced the
15-pass jax.hessian jet formulation with 6 AD passes + an analytic
bending block; this script checks the TPU result elementwise against
the SAME function executed on the host CPU backend (which is itself
oracle-tested against dense jax.hessian in tests/test_klshell.py).

Exit code 0 only if the max relative error is at roundoff (<1e-12).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ.setdefault("GOLDFISH_TPU_X64", "1")

import jax

# the env pre-imports jax with JAX_PLATFORMS=axon (sitecustomize) —
# request BOTH platforms before backend init or jax.devices("cpu")
# raises and the host-oracle comparison cannot run (leave cpu-forced
# runs alone)
_cur = getattr(jax.config, "jax_platforms", None) or ""
if "cpu" not in _cur:
    jax.config.update("jax_platforms", (_cur + ",cpu").lstrip(","))

import jax.numpy as jnp
import numpy as np

from goldfish_tpu.config import use_x64

use_x64(True)

from goldfish_tpu.models import wing
from goldfish_tpu.physics.kl_shell import element_hessians


def main():
    print("backend:", jax.default_backend(), flush=True)
    s = wing.build(num_el=6, p=3)
    rng = np.random.default_rng(0)
    d = 1e-3 * rng.standard_normal(np.asarray(s.cp).shape)

    # jitted with every array as an ARGUMENT (axon corrupts f64
    # closure constants, CLAUDE.md); no outer composition needed here
    fn = jax.jit(element_hessians)

    cpu = jax.devices("cpu")[0]
    host_args = jax.device_put(
        (s.stack, jnp.asarray(d), s.cp, s.h_init, s.E, s.nu), cpu)
    with jax.default_device(cpu):
        H_host = np.asarray(jax.jit(element_hessians)(*host_args))
    print("host oracle done", flush=True)

    t0 = time.perf_counter()
    H_dev = fn(s.stack, jnp.asarray(d), s.cp, s.h_init, s.E, s.nu)
    # force full readback (block_until_ready does not block on axon)
    H_dev = np.asarray(H_dev)
    t_dev = time.perf_counter() - t0
    err = float(np.max(np.abs(H_dev - H_host)) / np.max(np.abs(H_host)))
    print(f"device hessians: {t_dev:.2f}s (incl. compile), "
          f"max rel err vs host: {err:.3e}", flush=True)
    assert err < 1e-12, f"DEVICE HESSIAN MISMATCH: {err:.3e}"
    # warm timing
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        Hw = fn(s.stack, jnp.asarray(d), s.cp, s.h_init, s.E, s.nu)
        float(jnp.asarray(Hw).ravel()[0])
        ts.append(time.perf_counter() - t0)
    print(f"warm device hessian wall: {min(ts):.3f}s", flush=True)
    print("VALIDATE HESSIANS AXON: OK", flush=True)


if __name__ == "__main__":
    main()
