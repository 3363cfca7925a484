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
