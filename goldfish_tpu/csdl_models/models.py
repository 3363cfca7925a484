"""CSDL-alpha thin adapters over the framework-agnostic operations.

Mirror of the reference's `csdl_models` layer (reference:
GOLDFISH/csdl_models/disp_states_model.py:58-177 CustomImplicitOperation
hooks, int_energy_model.py, volume_model.py, compliance_model.py,
hth_map_model.py; umbrella GOLDFISH/nonmatching_opt_csdl.py:4-7 — only
disp_states / int_energy / volume / hth_map are active there, the rest
commented out; this build provides the full set). csdl_alpha is an
optional dependency.
"""

from __future__ import annotations

import numpy as np

import csdl_alpha as csdl

from goldfish_tpu.operations.disp_imop import DispImOperation
from goldfish_tpu.operations.exops import (
    ComplianceExOperation,
    IntEnergyExOperation,
    MaxvMStressExOperation,
    VolumeExOperation,
)

__all__ = ["DispStatesModel", "IntEnergyModel", "VolumeModel",
           "ComplianceModel", "MaxvMStressModel", "HthMapModel",
           "LinearMapModel"]


class DispStatesModel(csdl.experimental.CustomImplicitOperation):
    """Implicit displacement states (reference:
    csdl_models/disp_states_model.py)."""

    def __init__(self, nonmatching_sys, rtol=1e-10):
        super().__init__()
        self.op = DispImOperation(nonmatching_sys, rtol=rtol)

    def evaluate(self, cp, h_th):
        self.declare_input("CP_IGA", cp)
        self.declare_input("thickness_IGA", h_th)
        u = self.create_output("displacements", (self.op.vec_size,))
        self.declare_derivative_parameters(
            "displacements", "*", dependent=True)
        return u

    def solve_residual_equations(self, inputs, outputs):
        outputs["displacements"] = self.op.solve_nonlinear(
            inputs["CP_IGA"], inputs["thickness_IGA"],
            outputs.get("displacements"))
        self.op.linearize(inputs["CP_IGA"], inputs["thickness_IGA"],
                          outputs["displacements"])

    def compute_residual(self, inputs, outputs, residuals):
        residuals["displacements"] = self.op.apply_nonlinear(
            inputs["CP_IGA"], inputs["thickness_IGA"],
            outputs["displacements"])

    def compute_jacvec_product(self, inputs, outputs, d_inputs, d_outputs,
                               d_residuals, mode):
        self.op.linearize(inputs["CP_IGA"], inputs["thickness_IGA"],
                          outputs["displacements"])
        if mode == "fwd":
            d_residuals["displacements"] = self.op.apply_linear_fwd(
                d_inputs.get("CP_IGA"), d_inputs.get("thickness_IGA"),
                d_outputs.get("displacements"))
        else:
            cp_b, h_b, d_b = self.op.apply_linear_rev(
                d_residuals["displacements"])
            if "CP_IGA" in d_inputs:
                d_inputs["CP_IGA"] = cp_b
            if "thickness_IGA" in d_inputs:
                d_inputs["thickness_IGA"] = h_b
            if "displacements" in d_outputs:
                d_outputs["displacements"] = d_b

    def apply_inverse_jacobian(self, d_outputs, d_residuals, mode):
        if mode == "fwd":
            d_outputs["displacements"] = self.op.solve_linear_fwd(
                d_residuals["displacements"])
        else:
            d_residuals["displacements"] = self.op.solve_linear_rev(
                d_outputs["displacements"])


def _objective_model(op_cls, out_name):
    class _Model:
        def __init__(self, nonmatching_sys, **kw):
            self.op = op_cls(nonmatching_sys, **kw)

        def evaluate(self, cp, h_th, u):
            def fn(cp_, h_, u_):
                return np.array([self.op.compute(cp_, h_, u_)])

            def jac(cp_, h_, u_):
                g = self.op.gradients(cp_, h_, u_)
                return tuple(x[None, :] for x in g)

            # csdl_alpha custom explicit via function registration
            out = csdl.experimental.custom_jax_like(
                fn, jac, (cp, h_th, u), out_name) \
                if hasattr(csdl.experimental, "custom_jax_like") else None
            if out is None:
                # fall back to the generic custom explicit operation API
                class _Op(csdl.CustomExplicitOperation):
                    def __init__(self, op):
                        super().__init__()
                        self.op = op

                    def evaluate(self, cp_v, h_v, u_v):
                        self.declare_input("cp", cp_v)
                        self.declare_input("h", h_v)
                        self.declare_input("u", u_v)
                        return self.create_output(out_name, (1,))

                    def compute(self, inputs, outputs):
                        outputs[out_name] = np.array([self.op.compute(
                            inputs["cp"], inputs["h"], inputs["u"])])

                    def compute_derivatives(self, inputs, outputs, derivs):
                        g = self.op.gradients(inputs["cp"], inputs["h"],
                                              inputs["u"])
                        derivs[out_name, "cp"] = g[0][None, :]
                        derivs[out_name, "h"] = g[1][None, :]
                        derivs[out_name, "u"] = g[2][None, :]

                out = _Op(self.op).evaluate(cp, h_th, u)
            return out

    _Model.__name__ = op_cls.__name__.replace("ExOperation", "Model")
    return _Model


IntEnergyModel = _objective_model(IntEnergyExOperation, "w_int")
VolumeModel = _objective_model(VolumeExOperation, "volume")
ComplianceModel = _objective_model(ComplianceExOperation, "compliance")
MaxvMStressModel = _objective_model(MaxvMStressExOperation, "max_vmstress")


class LinearMapModel:
    """y = A x as a csdl matvec (all constant-matrix models: hth_map,
    cpffd2surf, align/pin/regu)."""

    def __init__(self, A):
        self.A = np.asarray(A)

    def evaluate(self, x):
        return csdl.matvec(csdl.Variable(value=self.A), x)


class HthMapModel(LinearMapModel):
    """Per-patch constant thickness -> flat thickness vector
    (reference: csdl_models/hth_map_model.py — block-of-ones map)."""

    def __init__(self, nonmatching_sys):
        from goldfish_tpu.design.pipeline import CPLayout

        lay = CPLayout(nonmatching_sys.metas, nonmatching_sys.stack.max_cp)
        P = nonmatching_sys.num_splines
        A = np.zeros((lay.n_flat, P))
        for i, n in enumerate(lay.n_per_patch):
            A[lay.offsets[i]: lay.offsets[i + 1], i] = 1.0
        super().__init__(A)
