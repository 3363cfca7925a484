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
