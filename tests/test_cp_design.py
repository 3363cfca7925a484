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


def test_align_expansion_operator_reproduces_align_null_space():
    """design->full expansion (the reference CPFFDesign2FullComp form,
    tube_shopt_mi_4patch_wffd.py:86-92): columns span exactly the
    align_operator null space — A_align @ (A_exp @ x) == 0 for all x,
    rank(A_exp) = n_design, and the representative dofs reproduce the
    design values (x_full[reps] == x)."""
    import numpy as np

    from goldfish_tpu.design.constraints import (
        align_expansion_operator,
        align_operator,
    )

    rng = np.random.default_rng(0)
    for shape, axis in (((3, 4, 5), 2), ((4, 4, 3), 0),
                        ((3, 3, 3), (1, 2))):
        A_exp, reps = align_expansion_operator(shape, axis)
        n_full = int(np.prod(shape))
        ax = (axis,) if np.ndim(axis) == 0 else tuple(axis)
        n_design = int(np.prod([s for a, s in enumerate(shape)
                                if a not in ax]))
        assert A_exp.shape == (n_full, n_design)
        assert reps.shape == (n_design,)
        A_al = align_operator(shape, axis)
        x = rng.normal(size=n_design)
        full = A_exp @ x
        np.testing.assert_allclose(A_al @ full, 0.0, atol=1e-14)
        np.testing.assert_allclose(full[reps], x)
        # every full dof is driven by exactly one design dof
        np.testing.assert_allclose(A_exp.sum(axis=1), 1.0)


def test_xi_interior_dofs_excludes_pinned_coordinates():
    """geometry/cpiga2xi.xi_interior_dofs: the returned dofs are
    disjoint from the edge-pinned columns, initial values sit strictly
    inside (0, 1), and every EXCLUDED real dof is at a pinned/boundary
    coordinate — the support of the reference XiConsComp bound
    (tube_shopt_mi_4patch_wffd.py:233-234)."""
    import numpy as np

    from demos.draft_tube_shopt_mi_wffd import build_mi_tube
    from goldfish_tpu.geometry.cpiga2xi import (
        xi_edge_constraints,
        xi_interior_dofs,
    )

    sys_ = build_mi_tube(num_el=2, p=2)
    mi = sys_.mi
    free = xi_interior_dofs(mi)
    assert free.size > 0
    edge_dofs, _ = xi_edge_constraints(mi)
    assert not set(free.tolist()) & set(edge_dofs.tolist())
    xi0 = np.asarray(mi.xi0).ravel()
    assert xi0[free].min() > 0.0 and xi0[free].max() < 1.0
    # excluded REAL dofs (not padding) are on a pinned/boundary value:
    # either an edge column, an end-pinned coordinate, or an endpoint
    # coordinate starting exactly at 0/1
    n_pts = np.asarray(mi.n_pts)
    N = np.asarray(mi.xi0).shape[1]
    end_dir = np.asarray(mi.end_dir)
    freeset = set(free.tolist())
    edgeset = set(edge_dofs.tolist())
    for i in range(np.asarray(mi.xi0).shape[0]):
        for k in range(int(n_pts[i])):
            for side in (0, 1):
                for c in (0, 1):
                    dof = ((i * N + k) * 2 + side) * 2 + c
                    if dof in freeset:
                        continue
                    pinned = dof in edgeset
                    pinned |= side == 0 and (
                        (k == 0 and c == int(end_dir[i, 0]))
                        or (k == int(n_pts[i]) - 1
                            and c == int(end_dir[i, 1])))
                    pinned |= k in (0, int(n_pts[i]) - 1) and (
                        abs(xi0[dof]) < 1e-9
                        or abs(xi0[dof] - 1.0) < 1e-9)
                    assert pinned, (i, k, side, c, xi0[dof])
