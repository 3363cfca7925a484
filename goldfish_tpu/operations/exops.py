"""Explicit operations: objectives with their partials, adapter-ready.

Mirrors the reference's explicit-operation protocol (`compute` +
per-input gradients; reference: GOLDFISH/operations/int_energy_exop.py
:61-107, volume_exop.py:52-84, compliance_exop.py,
max_vmstress_exop.py:333-) over flat real-dof numpy vectors. Every
gradient is one jitted jax.grad — the reference's per-input
hand-assembled UFL derivative forms are gone.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from goldfish_tpu.design.pipeline import CPLayout
from goldfish_tpu.physics import objectives
from goldfish_tpu.solver.system import NonMatchingSystem

__all__ = ["IntEnergyExOperation", "VolumeExOperation",
           "ComplianceExOperation", "MaxvMStressExOperation"]


class _ExOpBase:
    """Shared machinery: flat <-> padded conversion + jitted grads."""

    def __init__(self, system: NonMatchingSystem, fn):
        self.system = system
        self.data = system.data
        self.layout = CPLayout(system.metas, system.stack.max_cp)
        lay = self.layout

        def flat_fn(cp_f, h_f, d_f):
            cp = lay.to_padded(cp_f.reshape(-1, 3))
            h = lay.to_padded(h_f)
            d = lay.to_padded(d_f.reshape(-1, 3))
            return fn(self.data, d, cp, h)

        self._value = jax.jit(flat_fn)
        self._grads = jax.jit(jax.grad(flat_fn, argnums=(0, 1, 2)))

    def compute(self, cp, h, d):
        return float(self._value(jnp.asarray(cp), jnp.asarray(h),
                                 jnp.asarray(d)))

    def gradients(self, cp, h, d):
        """(dJ/dcp, dJ/dh, dJ/dd) as flat numpy arrays."""
        g = self._grads(jnp.asarray(cp), jnp.asarray(h), jnp.asarray(d))
        return tuple(np.asarray(x) for x in g)


class IntEnergyExOperation(_ExOpBase):
    def __init__(self, system):
        super().__init__(system, lambda data, d, cp, h:
                         objectives.internal_energy(data, d, cp, h))


class VolumeExOperation(_ExOpBase):
    def __init__(self, system):
        super().__init__(system, lambda data, d, cp, h:
                         objectives.volume(data, cp, h))


class ComplianceExOperation(_ExOpBase):
    def __init__(self, system):
        super().__init__(system, lambda data, d, cp, h:
                         objectives.compliance(data, d, cp, h))


class MaxvMStressExOperation(_ExOpBase):
    def __init__(self, system, rho=100.0, method="KS", through="top"):
        super().__init__(system, lambda data, d, cp, h:
                         objectives.max_vm_stress(data, d, cp, h, rho=rho,
                                                  method=method,
                                                  through=through))
