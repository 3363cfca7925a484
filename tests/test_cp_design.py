"""Design -> analysis CP pipeline: exactness of the composed
elevation+refinement operator and constraint-row semantics
(reference oracle: bsp_utils.CPSurfDesign2Analysis)."""

import numpy as np

from goldfish_tpu.design.cp_design import CPSurfDesign2Analysis
from goldfish_tpu.models.tbeam import create_surf


def _surfs():
    pts = [[-1.0, 0, 0], [1.0, 0, 0], [-1.0, 20, 0], [1.0, 20, 0]]
    return [create_surf(pts, 4, 8, 3), create_surf(pts, 4, 8, 3)]


def test_operator_reproduces_geometry():
    surfs = _surfs()
    d2a = CPSurfDesign2Analysis(surfs, design_nel=(2, 2))
    for i in (0, 1):
        for f in range(3):
            x0 = d2a.init_design_cp(i, f)
            cp = d2a.apply(i, x0)
            target = surfs[i].points.reshape(-1, 3)[:, f]
            # bilinear-origin geometry is exactly representable on the
            # coarse design grid
            assert np.abs(cp - target).max() < 1e-9


def test_operator_partition_of_unity():
    surfs = _surfs()
    d2a = CPSurfDesign2Analysis(surfs, design_nel=(2, 2))
    A = d2a.matrix(0)
    assert np.allclose(A.sum(axis=1), 1.0)  # affine invariance
    assert A.shape == (surfs[0].shape[0] * surfs[0].shape[1],
                       d2a.n_design(0))


def test_constraint_rows():
    surfs = _surfs()
    d2a = CPSurfDesign2Analysis(surfs, design_nel=(2, 2))
    nu, nv = d2a.design_shapes[0]
    Aa = d2a.align_rows(0, axis=0)
    assert Aa.shape == ((nu - 1) * nv, nu * nv)
    x = np.tile(np.arange(nv, dtype=float), nu)  # constant along u
    assert np.abs(Aa @ x).max() < 1e-14
    Ar = d2a.regu_rows(0, axis=1)
    xs = np.repeat(np.arange(nu, dtype=float), nv) + np.tile(
        np.linspace(0, 1, nv), nu)
    assert (Ar @ xs > 0).all()  # increasing along v
    Ap = d2a.pin_rows(0, [(0, 0), (nu - 1, nv - 1)])
    assert Ap.shape == (2, nu * nv)
    assert Ap[0, 0] == 1.0 and Ap[1, -1] == 1.0
