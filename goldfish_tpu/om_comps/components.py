"""OpenMDAO thin adapters over the framework-agnostic operations.

Class-for-class mirror of the reference's `om_comps` layer
(reference: GOLDFISH/om_comps/disp_states_comp.py,
int_energy_comp.py, volume_comp.py, compliance_comp.py,
max_vmstress_comp.py, hthfe2iga_comp.py, cpfe2iga_comp.py and the
ffd_comps/ package), so demo drivers written against the reference can
run on this build by swapping the import. OpenMDAO itself is an
optional dependency: importing this module without it raises the usual
ModuleNotFoundError.

Notes on fidelity:
  - dof vectors are flat real IGA dofs (node-major xyz). There is no
    FE/IGA split in this build, so the reference's *FE2IGA* comps are
    exact identity maps kept for graph compatibility.
  - the reference's `nonmatching_opt_om.py:18` imports
    `ffd_comps.cpffd_align_comp` which does not exist in its tree (a
    checked-in latent defect, SURVEY.md section 2.3); this layer
    provides a working `CPFFDAlignComp`.
"""

from __future__ import annotations

import numpy as np
import openmdao.api as om

from goldfish_tpu.operations.disp_imop import DispImOperation
from goldfish_tpu.operations.exops import (
    ComplianceExOperation,
    IntEnergyExOperation,
    MaxvMStressExOperation,
    VolumeExOperation,
)

__all__ = [
    "DispStatesComp", "IntEnergyComp", "VolumeComp", "ComplianceComp",
    "MaxvMStressComp", "CPFE2IGAComp", "HthFE2IGAComp", "HthFFD2FEComp",
    "CPFFD2SurfComp", "CPFFDAlignComp", "CPFFDPinComp", "CPFFDReguComp",
    "HthFFDAlignComp", "HthFFDReguComp",
]


class DispStatesComp(om.ImplicitComponent):
    """Implicit displacement states (reference:
    GOLDFISH/om_comps/disp_states_comp.py)."""

    def initialize(self):
        self.options.declare("nonmatching_sys")
        self.options.declare("input_cp_name", default="CP_IGA")
        self.options.declare("input_h_th_name", default="thickness_IGA")
        self.options.declare("output_u_name", default="displacements")
        self.options.declare("rtol", default=1e-10)

    def init_parameters(self, save_files=False):
        self.op = DispImOperation(self.options["nonmatching_sys"],
                                  rtol=self.options["rtol"])
        self.cp_name = self.options["input_cp_name"]
        self.h_name = self.options["input_h_th_name"]
        self.u_name = self.options["output_u_name"]

    def setup(self):
        op = self.op
        self.add_input(self.cp_name, shape=op.vec_size,
                       val=np.asarray(
                           op.layout.to_flat(op.system.cp)).ravel())
        self.add_input(self.h_name, shape=op.h_size,
                       val=np.asarray(
                           op.layout.to_flat(
                               op.system.h_init[..., None])).ravel())
        self.add_output(self.u_name, shape=op.vec_size)
        self.declare_partials(self.u_name, self.cp_name)
        self.declare_partials(self.u_name, self.h_name)
        self.declare_partials(self.u_name, self.u_name)

    def apply_nonlinear(self, inputs, outputs, residuals):
        residuals[self.u_name] = self.op.apply_nonlinear(
            inputs[self.cp_name], inputs[self.h_name], outputs[self.u_name])

    def solve_nonlinear(self, inputs, outputs):
        outputs[self.u_name] = self.op.solve_nonlinear(
            inputs[self.cp_name], inputs[self.h_name],
            outputs[self.u_name])

    def linearize(self, inputs, outputs, partials):
        self.op.linearize(inputs[self.cp_name], inputs[self.h_name],
                          outputs[self.u_name])

    def apply_linear(self, inputs, outputs, d_inputs, d_outputs,
                     d_residuals, mode):
        if mode == "fwd":
            d_residuals[self.u_name] += self.op.apply_linear_fwd(
                d_inputs.get(self.cp_name),
                d_inputs.get(self.h_name),
                d_outputs.get(self.u_name))
        else:
            cp_b, h_b, d_b = self.op.apply_linear_rev(
                d_residuals[self.u_name])
            if self.cp_name in d_inputs:
                d_inputs[self.cp_name] += cp_b
            if self.h_name in d_inputs:
                d_inputs[self.h_name] += h_b
            if self.u_name in d_outputs:
                d_outputs[self.u_name] += d_b

    def solve_linear(self, d_outputs, d_residuals, mode):
        if mode == "fwd":
            d_outputs[self.u_name] = self.op.solve_linear_fwd(
                d_residuals[self.u_name])
        else:
            d_residuals[self.u_name] = self.op.solve_linear_rev(
                d_outputs[self.u_name])


class _ObjectiveComp(om.ExplicitComponent):
    """Shared explicit-objective adapter (state + cp + h -> scalar)."""

    op_cls = None
    default_out = "objective"

    def initialize(self):
        self.options.declare("nonmatching_sys")
        self.options.declare("input_cp_name", default="CP_IGA")
        self.options.declare("input_h_th_name", default="thickness_IGA")
        self.options.declare("input_u_name", default="displacements")
        self.options.declare("output_name", default=self.default_out)
        self.options.declare("op_kwargs", default={})

    def init_parameters(self):
        self.op = self.op_cls(self.options["nonmatching_sys"],
                              **self.options["op_kwargs"])
        self.cp_name = self.options["input_cp_name"]
        self.h_name = self.options["input_h_th_name"]
        self.u_name = self.options["input_u_name"]
        self.out_name = self.options["output_name"]

    def setup(self):
        op = self.op
        n = op.layout.n_flat
        self.add_input(self.cp_name, shape=n * 3)
        self.add_input(self.h_name, shape=n)
        self.add_input(self.u_name, shape=n * 3)
        self.add_output(self.out_name)
        self.declare_partials(self.out_name, "*")

    def compute(self, inputs, outputs):
        outputs[self.out_name] = self.op.compute(
            inputs[self.cp_name], inputs[self.h_name], inputs[self.u_name])

    def compute_partials(self, inputs, partials):
        gcp, gh, gd = self.op.gradients(
            inputs[self.cp_name], inputs[self.h_name], inputs[self.u_name])
        partials[self.out_name, self.cp_name] = gcp
        partials[self.out_name, self.h_name] = gh
        partials[self.out_name, self.u_name] = gd


class IntEnergyComp(_ObjectiveComp):
    op_cls = IntEnergyExOperation
    default_out = "w_int"


class VolumeComp(_ObjectiveComp):
    op_cls = VolumeExOperation
    default_out = "volume"


class ComplianceComp(_ObjectiveComp):
    op_cls = ComplianceExOperation
    default_out = "compliance"


class MaxvMStressComp(_ObjectiveComp):
    op_cls = MaxvMStressExOperation
    default_out = "max_vmstress"


class _LinearMapComp(om.ExplicitComponent):
    """y = A x (+ b): all the constant sparse-matrix comps of the
    reference collapse to this one pattern."""

    def initialize(self):
        self.options.declare("A")
        self.options.declare("input_name")
        self.options.declare("output_name")
        self.options.declare("offset", default=None)

    def init_parameters(self):
        self.A = np.asarray(self.options["A"])
        self.in_name = self.options["input_name"]
        self.out_name = self.options["output_name"]
        self.offset = self.options["offset"]
        self.output_shape = self.A.shape[0]

    def setup(self):
        self.add_input(self.in_name, shape=self.A.shape[1])
        self.add_output(self.out_name, shape=self.A.shape[0])
        self.declare_partials(self.out_name, self.in_name, val=self.A)

    def compute(self, inputs, outputs):
        y = self.A @ inputs[self.in_name]
        if self.offset is not None:
            y = y + self.offset
        outputs[self.out_name] = y


class _IdentityComp(_LinearMapComp):
    """Exact identity: the reference's FE2IGA pseudo-inverse solves
    (GOLDFISH/operations/cpfe2iga_imop.py normal equations) are
    unnecessary here — IGA dofs are THE dofs."""

    def initialize(self):
        super().initialize()
        self.options.declare("size")

    def init_parameters(self):
        self.options["A"] = np.eye(self.options["size"])
        super().init_parameters()


class CPFE2IGAComp(_IdentityComp):
    pass


class HthFE2IGAComp(_IdentityComp):
    pass


class HthFFD2FEComp(_LinearMapComp):
    """h_ffd -> flat thickness (A = ThicknessFFD.F)."""


class CPFFD2SurfComp(_LinearMapComp):
    """p_ffd -> flat surface CPs (A = FFDBlock.F per field)."""


class CPFFDAlignComp(_LinearMapComp):
    """A = design.constraints.align_operator (the comp missing from the
    reference tree)."""


class CPFFDPinComp(_LinearMapComp):
    pass


class CPFFDReguComp(_LinearMapComp):
    pass


class HthFFDAlignComp(_LinearMapComp):
    pass


class HthFFDReguComp(_LinearMapComp):
    pass
