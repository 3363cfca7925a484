"""System tests: the demo drivers at tiny sizes (the role the
reference's demos_om scripts play as de-facto integration tests,
SURVEY.md section 4)."""

import pytest


@pytest.mark.slow
def test_shape_opt_mint_tbeam_demo():
    from demos import shape_opt_mint_tbeam

    res, J0, _ = shape_opt_mint_tbeam.main(num_el=3, p=2, maxiter=5,
                                           verbose=False)
    assert res.fun < 0.9 * J0


@pytest.mark.slow
def test_shape_opt_arch_demo():
    from demos import shape_opt_arch

    res, J0, _, _ = shape_opt_arch.main(num_el=3, p=2, num_patches=3,
                                        maxiter=10, verbose=False)
    # membrane action beats bending by a wide margin
    assert res.fun < 0.3 * J0


@pytest.mark.slow
def test_thickness_opt_plate_demo(tmp_path):
    from demos import thickness_opt_plate

    res, sys_, th = thickness_opt_plate.main(
        num_el=3, maxiter=6, results=str(tmp_path), verbose=False)
    assert res.history[0] > res.fun


@pytest.mark.slow
def test_pegasus_reduced():
    """Matrix-free pegasus-class opt at reduced scale (full-scale run:
    demos/pegasus_thickness_opt.py --sections 18)."""
    from demos.pegasus_thickness_opt import main

    res, sys_, th, wall = main(n_sections=4, num_el=2, p=2, maxiter=3,
                               verbose=False)
    assert res.fun < res.history[0]


@pytest.mark.slow
def test_pegasus_const_th_reduced():
    """Const-thickness pegasus variant: one design dof per patch (the
    reference's pegasus_const_th_opt_wint.py parametrization)."""
    from demos.pegasus_thickness_opt import main

    res, sys_, th, wall = main(n_sections=3, num_el=2, p=2, maxiter=3,
                               verbose=False, const_th=True)
    assert res.fun < res.history[0]
    assert len(res.x["h_ffd"]) == sys_.num_splines  # one dof per patch


@pytest.mark.slow
def test_evtol_demo_reduced():
    from demos.evtol_wing_shopt import main

    res, sys_, sh, th = main(n_sections=2, num_el=2, p=2, maxiter=2,
                             verbose=False)
    assert res.fun <= res.history[0]


@pytest.mark.slow
def test_caddee_demo_reduced():
    import numpy as np

    from demos.caddee_aeroelastic_wing import main

    J0, tip, gh, model = main(n_sections=2, num_el=2, p=2, n_fp=2,
                              verbose=False)
    assert np.isfinite(J0) and J0 > 0


@pytest.mark.slow
def test_curved_mi_demo_reduced():
    from demos.shape_opt_mint_tbeam_curved import main

    res, sys_ = main(num_el=3, p=2, maxiter=3, verbose=False)
    assert res.fun < res.history[0]


@pytest.mark.slow
def test_draft_tube_mi_wffd_demo_reduced():
    """MI + shape-FFD tube demo (reference flagship counterpart:
    draft_tube_shape_opt_mi_wffd_4patch.py): the optimizer must round
    the ovalized pressurized tube back out through the CP -> xi solve,
    with the pinned support ring held."""
    import numpy as np

    from demos.draft_tube_shopt_mi_wffd import main

    res, sys_, sh = main(num_el=2, p=2, maxiter=3, verbose=False)
    assert res.fun < res.history[0]
    assert np.all(np.isfinite(res.x["p_ffd"]))


@pytest.mark.slow
def test_aeroelastic_wing_demo_reduced():
    """Fixed-point aeroelastic loop demo: finite coupled equilibrium
    and a finite coupled-adjoint gradient through it."""
    import numpy as np

    from demos.aeroelastic_wing import main

    J0, tip, gh, sys_ = main(num_el=2, p=2, n_chord=2, n_span=3,
                             n_fp=3, verbose=False)
    assert np.isfinite(J0) and J0 > 0
    assert float(tip[2]) > 0  # lift bends the wing up
    assert np.all(np.isfinite(np.asarray(gh)))


@pytest.mark.slow
def test_wing_thickness_opt_demo_reduced(tmp_path):
    """Flagship wing thickness-opt demo (the bench workload as a
    driver): objective drops, volume and align constraints hold,
    checkpoint + vtk outputs written."""
    import os

    import numpy as np

    from demos.wing_thickness_opt import main

    res, sys_, th = main(num_el=2, p=2, maxiter=3,
                         results=str(tmp_path), verbose=False)
    assert res.fun < res.history[0]
    assert os.path.exists(os.path.join(str(tmp_path), "opt_state.npz"))
    assert np.all(np.isfinite(res.x["h_ffd"]))


@pytest.mark.slow
def test_evtol_mi_demo_full_chain_parity():
    """eVTOL-class moving-seam demo (round-2 verdict item #3):
    d(w_int)/d(spar/rib design) through the OM graph — custom align
    comp -> implicit CP->xi -> implicit MI displacement solve — vs FD.
    Uses the thicker-shell configuration (cond control: at 4 mm the
    KL-shell+penalty conditioning floors the FD reference itself near
    1e-5)."""
    from demos.evtol_wing_shopt_mi import build_problem

    prob, sys_ = build_problem(num_el=3, p=2, maxiter=2, h_th=0.02)
    prob.run_model()
    rep = prob.check_totals(of=["int_energy_comp.w_int"],
                            wrt=["inputs_comp.spar_rib_design"],
                            step=1e-6)
    for key, entry in rep.items():
        assert entry["rel error"] < 1e-5, (key, entry["rel error"])


@pytest.mark.slow
def test_evtol_mi_demo_converges():
    """Moving spar/rib seams: SLSQP converges (objective drops, seams
    track the design, xi edge invariant holds)."""
    import numpy as np

    from demos.evtol_wing_shopt_mi import main

    prob, sys_, J0, J1 = main(num_el=3, p=2, maxiter=8, verbose=False)
    assert J1 < 0.75 * J0          # large physical improvement
    x = np.asarray(prob["inputs_comp.spar_rib_design"])
    assert abs(x[0] - 0.30) > 0.05  # the spar actually moved


def test_evtol_mi_variant_design_maps():
    """The reference's align-comp variant family
    (custom_comps/evtol_{q,r,s}spar_{r,s}rib_align_comp.py): every
    variant's affine map reproduces the initial geometry at x0, and
    the outer-mold-line variant keeps the edge-pinned seams EXACTLY
    coincident under arbitrary profile + spar motion (the exactness
    argument that replaces the reference's oversized interior
    members)."""
    import numpy as np

    from demos.evtol_wing_shopt_mi import (
        BOX_H, HALF_SPAN, VARIANTS, build_system, design_map)
    from goldfish_tpu.design.pipeline import CPLayout
    from goldfish_tpu.ops.bspline import rational_basis_2d

    sys_ = build_system(num_el=2, p=2)
    lay = CPLayout(sys_.metas, sys_.stack.max_cp)
    cp0 = np.array(lay.to_flat(sys_.cp)).ravel()
    n_dv_expect = {"rspar_rrib": 3, "rspar_srib": 4, "sspar_srib": 6,
                   "qspar_rrib": 7, "qspar_srib": 8,
                   "rspar_rrib_outer": 5}
    for v in VARIANTS:
        A, offset, x0, lo, up = design_map(
            sys_, y_rib0=0.45 * HALF_SPAN, variant=v)
        assert x0.size == n_dv_expect[v]
        assert np.abs(A @ x0 + offset - cp0).max() < 1e-12
        assert np.all(lo <= x0) and np.all(x0 <= up)

    # x0 must reproduce the geometry the system was BUILT at, also for
    # a NON-default design0 (s0 threads through — a hard-coded 0.30
    # would silently jump the spar on the first model evaluation)
    sys_b = build_system(s_root=0.45, s_tip=0.20, num_el=2, p=2)
    cp_b = np.array(CPLayout(sys_b.metas, sys_b.stack.max_cp)
                    .to_flat(sys_b.cp)).ravel()
    for v in ("rspar_rrib", "sspar_srib", "qspar_rrib", "qspar_srib"):
        A, offset, x0, lo, up = design_map(
            sys_b, y_rib0=0.45 * HALF_SPAN, variant=v,
            s0=(0.45, 0.20))
        assert np.abs(A @ x0 + offset - cp_b).max() < 1e-12

    # outer variant: exact seam coincidence at a non-trivial design
    A, offset, x0, lo, up = design_map(
        sys_, y_rib0=0.45 * HALF_SPAN, variant="rspar_rrib_outer")
    x = x0.copy()
    x[:2] = [0.35, 0.42]
    x[3:] = BOX_H * np.array([1.3, 0.9])     # dof 0 pinned
    cp_new = (A @ x + offset).reshape(-1, 3)
    offs = np.concatenate([[0], np.cumsum([m.n_cp for m in sys_.metas])])

    def surf_eval(ip, uv):
        s = sys_.surfs[ip]
        p, q = s.degree
        conn, tab = rational_basis_2d(
            s.knots[0], s.knots[1], p, q, s.weights,
            np.asarray(uv, float)[None, :], nd=0)
        return tab[(0, 0)][0] @ cp_new[offs[ip]:offs[ip + 1]][conn[0]]

    for v in np.linspace(0.0, 1.0, 7):
        pt_spar = surf_eval(2, [1.0, v])         # spar top edge
        pt_skin = surf_eval(0, [0.5, pt_spar[1] / HALF_SPAN])
        assert abs(pt_spar[2] - pt_skin[2]) < 1e-12
    for u in np.linspace(0.0, 1.0, 7):
        pt_rib = surf_eval(3, [u, 1.0])          # rib top edge
        pt_skin = surf_eval(0, [0.3, pt_rib[1] / HALF_SPAN])
        assert abs(pt_rib[2] - pt_skin[2]) < 1e-12


@pytest.mark.slow
def test_evtol_mi_variants_converge():
    """Straight-spar/straight-rib and outer-mold-line variants run
    end-to-end: SLSQP lowers the objective, xi edge invariant holds."""
    import numpy as np

    from demos.evtol_wing_shopt_mi import main

    for variant in ("sspar_srib", "rspar_rrib_outer"):
        prob, sys_, J0, J1 = main(num_el=2, p=2, maxiter=2,
                                  verbose=False, variant=variant)
        assert J1 < J0
        x = np.asarray(prob["inputs_comp.spar_rib_design"])
        assert np.all(np.isfinite(x))


@pytest.mark.slow
def test_tbeam_shape_opt_demo():
    """Fixed-intersection T-beam shape opt (reference
    T_beam_shape_opt_wint.py role): stiffness improves and the
    off-center web migrates toward the flange center."""
    from demos.tbeam_shape_opt import main

    res, J0, web_x, _, _ = main(num_el=3, p=2, maxiter=8, x_web=0.4,
                                verbose=False)
    assert res.fun < J0
    assert abs(web_x) < 0.4


@pytest.mark.slow
def test_tube_shape_opt_demo():
    """Fixed-intersection tube shape opt (reference
    tube_shape_opt_wint.py role): pressurized elliptical tube rounds
    toward the membrane-dominated circle."""
    from demos.tube_shape_opt import main

    res, J0, _, _ = main(num_el=3, p=2, maxiter=4, verbose=False)
    assert res.fun < J0


@pytest.mark.slow
def test_plate_hole_trimmed_demo():
    """Trimmed-patch thickness opt (plate with circular hole):
    objective decreases and material concentrates at the hole band
    (Kirsch stress concentration)."""
    from demos.plate_hole_thickness_opt import main

    res, sys_, th, (near, far) = main(num_el=4, maxiter=5,
                                      results="", verbose=False)
    assert res.fun < res.history[0]
    assert near > 1.05 * far


@pytest.mark.slow
def test_tube_shopt_mi_4patch_wffd_demo_reduced():
    """The OM-graph port of the reference tube MI driver
    (tube_shopt_mi_4patch_wffd.py): multi-block FFD with z-align
    expansion, pin/regu linear constraints and the XiConsComp-role
    bound on the free seam coordinates; objective decreases and every
    free xi stays strictly inside (0, 1)."""
    import numpy as np

    from demos.tube_shopt_mi_4patch_wffd import main

    prob = main(num_el=2, maxiter=3)
    xi = np.asarray(prob["cpiga2xi_comp.int_para"]).ravel()
    free = xi[prob.model.xi_free]
    assert free.min() > 0.0 and free.max() < 1.0


@pytest.mark.slow
def test_plate_stress_constrained_thickness_demo():
    """Stress-constrained sizing (MaxvMStressComp in the OM graph,
    reference operation: GOLDFISH/operations/max_vmstress_exop.py
    :167-273): volume decreases and the KS max-vM constraint is ACTIVE
    at the optimum (it is what stops the thinning)."""
    from demos.plate_var_th_opt_stress import main

    main(num_el=3, maxiter=30)
