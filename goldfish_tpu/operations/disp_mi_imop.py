"""Moving-intersection implicit displacement operation (adapter surface).

Mirror of the reference's `DispMintImOpeartion`
(reference: GOLDFISH/operations/disp_mi_imop.py — same 6-method
protocol as disp_imop with the extra xi input and dRIGAdxi matvec terms
:54-108) plus the CP->xi operation (`CPIGA2XiImOperation`,
reference: operations/cpiga2xi_imop.py). Vectors at the boundary are
flat numpy; all inner kernels are the jitted argument-passing functions
of solver/system_mi.py and geometry/cpiga2xi.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from goldfish_tpu.design.pipeline import CPLayout
from goldfish_tpu.solver.system_mi import (
    MINonMatchingSystem,
    adjoint_solve_mi,
    newton_solve_mi,
    residual_mi,
)

__all__ = ["DispMintImOperation", "CPIGA2XiImOperation"]


class CPIGA2XiImOperation:
    """Implicit CP -> xi solve with linearize/solve_linear semantics
    (reference: operations/cpiga2xi_imop.py:40-102). The factorized
    dR/dxi of the reference's SuperLU becomes a batched dense solve
    inside the jitted adjoint."""

    def __init__(self, mi_system: MINonMatchingSystem):
        self.sys = mi_system
        self.c2x = mi_system.c2x
        self.layout = CPLayout(mi_system.metas, mi_system.stack.max_cp)
        self.xi_size = int(np.prod(self.c2x.xi0_flat.shape))

    def solve_nonlinear(self, cp_flat):
        cp = self.layout.to_padded(
            jnp.asarray(cp_flat).reshape(-1, 3))
        return np.asarray(self.c2x.solve(cp)).ravel()

    def apply_nonlinear(self, cp_flat, xi_flat):
        from goldfish_tpu.geometry.cpiga2xi import _c2x_res

        cp = self.layout.to_padded(jnp.asarray(cp_flat).reshape(-1, 3))
        x = jnp.asarray(xi_flat).reshape(self.c2x.xi0_flat.shape)
        r = _c2x_res(self.c2x.ss, self.c2x.mi, cp, x,
                     p=self.c2x.p, q=self.c2x.q)
        return np.asarray(r).ravel()

    def vjp(self, cp_flat, xi_flat, xi_bar):
        """d(xi)/d(cp)^T @ xi_bar via the implicit-function adjoint."""
        from goldfish_tpu.geometry.cpiga2xi import _c2x_adjoint

        cp = self.layout.to_padded(jnp.asarray(cp_flat).reshape(-1, 3))
        x = jnp.asarray(xi_flat).reshape(self.c2x.xi0_flat.shape)
        g = jnp.asarray(xi_bar).reshape(x.shape)
        dcp = _c2x_adjoint(self.c2x.ss, self.c2x.mi, cp, x, g,
                           p=self.c2x.p, q=self.c2x.q)
        return np.asarray(self.layout.to_flat(dcp)).ravel()


class DispMintImOperation:
    """Implicit displacement with moving-intersection input xi."""

    def __init__(self, mi_system: MINonMatchingSystem, rtol=1e-10,
                 max_it=30):
        self.sys = mi_system
        self.layout = CPLayout(mi_system.metas, mi_system.stack.max_cp)
        self.rtol = rtol
        self.max_it = max_it
        self.vec_size = self.layout.n_flat * 3
        self._state = None

    def _unpack(self, cp_f, h_f, d_f, xi_f):
        lay = self.layout
        return (lay.to_padded(jnp.asarray(cp_f).reshape(-1, 3)),
                lay.to_padded(jnp.asarray(h_f)),
                lay.to_padded(jnp.asarray(d_f).reshape(-1, 3)),
                jnp.asarray(xi_f).reshape(self.sys.c2x.xi0_flat.shape))

    def solve_nonlinear(self, cp_f, h_f, xi_f, d0_f=None):
        d0_f = np.zeros(self.vec_size) if d0_f is None else d0_f
        cp, h, d0, xi = self._unpack(cp_f, h_f, d0_f, xi_f)
        s = self.sys
        d, it, rn = newton_solve_mi(s.data, s.mi, s.co, s.ss, s.pdeg,
                                    s.qdeg, cp, h, xi, d0,
                                    rtol=self.rtol, max_it=self.max_it)
        return np.asarray(self.layout.to_flat(d)).ravel()

    def apply_nonlinear(self, cp_f, h_f, xi_f, d_f):
        cp, h, d, xi = self._unpack(cp_f, h_f, d_f, xi_f)
        s = self.sys
        r = residual_mi(s.data, s.mi, s.co, s.ss, s.pdeg, s.qdeg, d, cp,
                        h, xi)
        return np.asarray(self.layout.to_flat(r)).ravel()

    def linearize(self, cp_f, h_f, xi_f, d_f):
        self._state = (cp_f, h_f, xi_f, d_f)

    def solve_linear_rev_and_accumulate(self, dJ_dd_flat):
        """One-call reverse mode: lam = K^-T g; returns
        (cp_bar, h_bar, xi_bar) = -(dR/d.)^T lam — the composition the
        OM adapter performs via solve_linear + apply_linear."""
        cp_f, h_f, xi_f, d_f = self._state
        cp, h, d, xi = self._unpack(cp_f, h_f, d_f, xi_f)
        g = self.layout.to_padded(
            jnp.asarray(dJ_dd_flat).reshape(-1, 3))
        s = self.sys
        dcp, dh, dxi = adjoint_solve_mi(s.data, s.mi, s.co, s.ss, s.pdeg,
                                        s.qdeg, d, cp, h, xi, g)
        return (np.asarray(self.layout.to_flat(dcp)).ravel(),
                np.asarray(self.layout.to_flat(dh[..., None])).ravel(),
                np.asarray(dxi).ravel())
