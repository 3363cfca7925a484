"""CAD pipeline: IGS import + OCC-free intersection computation,
validated against the reference's own geometry and its OpenCASCADE-
computed intersection cache (reference files:
demos_csdl_alpha/thickness_opt/geometry/plate_geometry.igs and
plate_int_data.npz)."""

import os

import numpy as np
import pytest

from goldfish_tpu.geometry.igs_io import read_igs_file
from goldfish_tpu.geometry.preprocessing import (
    Preprocessor,
    closest_point_projection,
)

REF_IGS = ("/root/reference/demos_csdl_alpha/thickness_opt/geometry/"
           "plate_geometry.igs")
REF_NPZ = "/root/reference/demos_csdl_alpha/thickness_opt/plate_int_data.npz"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_IGS), reason="reference geometry not mounted")


@pytest.fixture(scope="module")
def plate_surfs():
    return read_igs_file(REF_IGS)


def test_igs_reader(plate_surfs):
    surfs = plate_surfs
    assert len(surfs) == 6
    for s in surfs:
        assert s.degree == (3, 3)
        # the plate is flat: z == 0 everywhere
        assert np.abs(s.points[..., 2]).max() < 1e-12
    # strips tile [0,1] x [0,1]
    los = np.array([s.bounds()[0] for s in surfs])
    his = np.array([s.bounds()[1] for s in surfs])
    assert np.isclose(los[:, 0].min(), 0.0) and np.isclose(
        his[:, 0].max(), 1.0)


def test_closest_point_projection(plate_surfs):
    s = plate_surfs[2]
    rng = np.random.default_rng(0)
    uv = rng.uniform(0.1, 0.9, size=(20, 2))
    X = np.stack([s.evaluate(np.array([u]), np.array([v]))[0, 0]
                  for u, v in uv])
    uvp, dist = closest_point_projection(s, X)
    assert dist.max() < 1e-10


def test_compute_intersections_matches_occ_cache(plate_surfs):
    pre = Preprocessor(plate_surfs).compute_intersections(
        rtol=1e-4, mortar_refine=2)
    ref = np.load(REF_NPZ, allow_pickle=True)
    assert pre.num_intersections == int(ref["name1"]) == 5
    assert [list(m) for m in ref["name2"]] == pre.mapping_list
    # physical curves must coincide with OCC's: point-to-polyline
    # distance (sampling densities differ)
    def poly_dist(P, Q):
        a, b = Q[:-1], Q[1:]
        ab = b - a
        t = np.clip(((P[:, None, :] - a[None]) * ab[None]).sum(-1)
                    / (ab * ab).sum(-1)[None], 0, 1)
        proj = a[None] + t[..., None] * ab[None]
        return np.linalg.norm(P[:, None] - proj, axis=-1).min(1)

    for i in range(5):
        ours = pre.intersections_phy_coords[i]
        theirs = np.asarray(ref["name3"][i])
        d = poly_dist(ours, theirs)
        assert d.max() < 1e-6, (i, d.max())
        # endpoints exact (full-length intersection)
        assert np.allclose(sorted([ours[0, 1], ours[-1, 1]]), [0.0, 1.0],
                           atol=1e-8)


def test_cache_roundtrip(tmp_path, plate_surfs):
    pre = Preprocessor(plate_surfs).compute_intersections(
        rtol=1e-4, mortar_refine=2)
    p = str(tmp_path / "cache.npz")
    pre.save_intersections_data(p)
    pre2 = Preprocessor(plate_surfs).load_intersections_data(p)
    assert pre2.num_intersections == pre.num_intersections
    assert pre2.mapping_list == pre.mapping_list
    for a, b in zip(pre.intersections_para_coords,
                    pre2.intersections_para_coords):
        assert np.allclose(a[0], b[0]) and np.allclose(a[1], b[1])


def test_load_reference_cache(plate_surfs):
    pre = Preprocessor(plate_surfs).load_intersections_data(REF_NPZ)
    assert pre.num_intersections == 5
    specs = pre.interface_specs()
    assert len(specs) == 5
    assert all(t == "edge" for t in pre.intersections_type)


def test_igs_writer_roundtrip(tmp_path):
    """write_igs_file -> read_igs_file reproduces control nets exactly
    (the reference relies on OCC for IGES output; SURVEY.md 2.4)."""
    from goldfish_tpu.geometry.igs_io import read_igs_file, write_igs_file
    from goldfish_tpu.models import boxwing

    sys = boxwing.build(n_sections=2, num_el=2, p=2)
    path = str(tmp_path / "wing.igs")
    write_igs_file(path, sys.surfs)
    back = read_igs_file(path)
    assert len(back) == len(sys.surfs)
    for a, b in zip(sys.surfs, back):
        assert np.allclose(a.control, b.control, atol=1e-12)
        for ka, kb in zip(a.knots, b.knots):
            assert np.allclose(ka, kb)


def test_step_roundtrip_and_refine(tmp_path):
    """STEP Part-21 B-spline surface import/export (reference reaches
    STEP only through pythonOCC; round-1 verdict missing #8), plus the
    reparametrize/refine-on-import pipeline."""
    from goldfish_tpu.geometry.cadkit import circle, extrude
    from goldfish_tpu.geometry.step_io import (
        read_step_file,
        refine_surfaces,
        write_step_file,
    )
    from goldfish_tpu.models import tbeam

    s0 = tbeam.create_surf([[-1, 0, 0], [1, 0, 0], [-1, 4, 0],
                            [1, 4, 0]], 2, 3, 3)
    # a RATIONAL surface too (exact circular arc: non-unit weights)
    arc = circle(center=[0, 0, 0], radius=1.0, angle=(0.0, 0.5))
    s1 = extrude(arc, [0.0, 0.0, 2.0])
    path = str(tmp_path / "t.stp")
    write_igs = write_step_file(path, [s0, s1])
    back = read_step_file(path)
    assert len(back) == 2
    for a, b in zip([s0, s1], back):
        assert np.allclose(a.control, b.control, atol=1e-12)
        for ka, kb in zip(a.knots, b.knots):
            assert np.allclose(ka, kb)
    r = refine_surfaces(back, num_el=(4, 4), degree=3)
    u = np.linspace(0, 1, 7)
    assert np.allclose(s1.evaluate(u, u), r[1].evaluate(u, u),
                       atol=1e-10)


def test_igs_curve_roundtrip(tmp_path):
    """Type-126 rational B-spline curves: write_igs_file(curves=...) ->
    read_igs_curves reproduces homogeneous control exactly, mixed in a
    file that also carries 128 surfaces (IGES 5.3 entity 126)."""
    from goldfish_tpu.geometry.cadkit import circle, line, ruled
    from goldfish_tpu.geometry.igs_io import (
        read_igs_curves,
        read_igs_file,
        write_igs_file,
    )

    arc = circle(radius=2.0, angle=(0.0, np.pi / 2))  # rational
    seg = line([0, 0, 0], [1, 2, 3])                  # polynomial
    surf = ruled(line([0, 0, 0], [1, 0, 0]), line([0, 1, 0], [1, 1, 0]))
    path = str(tmp_path / "mixed.igs")
    write_igs_file(path, [surf], curves=[arc, seg])
    back_s = read_igs_file(path)
    back_c = read_igs_curves(path)
    assert len(back_s) == 1 and len(back_c) == 2
    for a, b in zip([arc, seg], back_c):
        assert np.allclose(a.control, b.control, atol=1e-12)
        assert np.allclose(a.knots[0], b.knots[0])
    # evaluated points of the rational arc stay on the circle
    t = np.linspace(0, 1, 7)
    pts = back_c[0].evaluate(t)
    assert np.allclose(np.linalg.norm(pts[:, :2], axis=1), 2.0,
                       atol=1e-12)


def test_step_assembly_roundtrip(tmp_path):
    """STEP assembly instancing: ITEM_DEFINED_TRANSFORMATION +
    (REPRESENTATION_RELATIONSHIP ... WITH_TRANSFORMATION) placements
    resolved by read_step_assembly (the role OCC's STEP assembly
    resolution plays for the reference's read_stp_file)."""
    from goldfish_tpu.geometry.cadkit import circle, extrude
    from goldfish_tpu.geometry.step_io import (
        read_step_assembly,
        read_step_file,
        transform_surface,
        write_step_assembly,
    )
    from goldfish_tpu.models import tbeam

    s0 = tbeam.create_surf([[-1, 0, 0], [1, 0, 0], [-1, 4, 0],
                            [1, 4, 0]], 2, 3, 3)
    arc = circle(center=[0, 0, 0], radius=1.0, angle=(0.0, 0.5))
    s1 = extrude(arc, [0.0, 0.0, 2.0])

    th = 0.3
    Rz = np.array([[np.cos(th), -np.sin(th), 0.0],
                   [np.sin(th), np.cos(th), 0.0],
                   [0.0, 0.0, 1.0]])
    t1 = np.array([5.0, -2.0, 1.0])
    instances = [(0, np.eye(3), np.zeros(3)),
                 (0, Rz, t1),
                 (1, Rz.T, np.array([0.0, 0.0, 7.0]))]
    path = str(tmp_path / "asm.stp")
    write_step_assembly(path, [[s0], [s1]], instances)

    got = read_step_assembly(path)
    assert len(got) == 3
    exp = [transform_surface([s0, s1][pi], R, t)
           for pi, R, t in instances]
    # order: instances of the single root are emitted in link order
    u = np.linspace(0, 1, 5)
    matched = set()
    for e in exp:
        pe = e.evaluate(u, u)
        hit = None
        for j, g in enumerate(got):
            if j in matched:
                continue
            if np.allclose(pe, g.evaluate(u, u), atol=1e-10):
                hit = j
                break
        assert hit is not None, "instance not found in assembly read"
        matched.add(hit)

    # plain reader still sees the un-instanced master geometry
    masters = read_step_file(path)
    assert len(masters) == 2

    # a non-assembly file passes through read_step_assembly unchanged
    from goldfish_tpu.geometry.step_io import write_step_file

    flat = str(tmp_path / "flat.stp")
    write_step_file(flat, [s0, s1])
    same = read_step_assembly(flat)
    assert len(same) == 2
    for a, b in zip([s0, s1], same):
        assert np.allclose(a.control, b.control, atol=1e-12)


def test_step_axis_frame_degenerate_refdir():
    """AXIS2_PLACEMENT_3D with the axis parallel to the default
    ref_direction and no explicit ref_direction must not produce a
    NaN frame (ISO 10303-42 allows deriving any non-parallel
    default)."""
    from goldfish_tpu.geometry.step_io import _axis_frame

    ents = {1: "AXIS2_PLACEMENT_3D('',#2,#3,$)",
            2: "CARTESIAN_POINT('',(1.,2.,3.))",
            3: "DIRECTION('',(1.,0.,0.))"}
    pts = {2: np.array([1.0, 2.0, 3.0])}
    M, o = _axis_frame(1, ents, pts)
    assert np.all(np.isfinite(M))
    np.testing.assert_allclose(M @ M.T, np.eye(3), atol=1e-12)
    np.testing.assert_allclose(M[:, 2], [1.0, 0.0, 0.0], atol=1e-12)


def test_step_product_structure(tmp_path):
    """AP203/AP214 product structure: write_step_assembly emits
    PRODUCT / NEXT_ASSEMBLY_USAGE_OCCURRENCE / CONTEXT_DEPENDENT_
    SHAPE_REPRESENTATION records; read_step_assembly(with_structure=
    True) returns per-surface product names and instance paths, and
    the NAUO resolves the parent/child representation orientation even
    for an exporter using the OPPOSITE rep_1/rep_2 convention (the
    role OCC's document-label tree plays for the reference's STEP
    imports)."""
    import re as _re

    from goldfish_tpu.geometry.cadkit import circle, extrude
    from goldfish_tpu.geometry.step_io import (
        read_step_assembly,
        transform_surface,
        write_step_assembly,
    )
    from goldfish_tpu.models import tbeam

    s0 = tbeam.create_surf([[-1, 0, 0], [1, 0, 0], [-1, 4, 0],
                            [1, 4, 0]], 2, 3, 3)
    arc = circle(center=[0, 0, 0], radius=1.0, angle=(0.0, 0.5))
    s1 = extrude(arc, [0.0, 0.0, 2.0])
    th = 0.4
    Rz = np.array([[np.cos(th), -np.sin(th), 0.0],
                   [np.sin(th), np.cos(th), 0.0],
                   [0.0, 0.0, 1.0]])
    instances = [(0, np.eye(3), np.zeros(3)),
                 (1, Rz, np.array([3.0, -1.0, 2.0]))]
    path = str(tmp_path / "named.stp")
    write_step_assembly(path, [[s0], [s1]], instances,
                        part_names=["skin", "spar"],
                        assembly_name="wing",
                        instance_names=["skin_1", "spar_1"])

    surfs, meta = read_step_assembly(path, with_structure=True)
    assert len(surfs) == 2 and len(meta) == 2
    by_prod = {m["product"]: (s, m) for s, m in zip(surfs, meta)}
    assert set(by_prod) == {"skin", "spar"}
    assert by_prod["skin"][1]["path"] == ("wing", "skin_1")
    assert by_prod["spar"][1]["path"] == ("wing", "spar_1")
    u = np.linspace(0, 1, 5)
    np.testing.assert_allclose(
        by_prod["spar"][0].evaluate(u, u),
        transform_surface(s1, Rz, np.array([3.0, -1.0, 2.0]))
        .evaluate(u, u), atol=1e-10)

    # opposite exporter convention: swap rep_1/rep_2 in every
    # relationship AND the two frames of its ITEM_DEFINED_
    # TRANSFORMATION (a consistent parent->child file). The NAUO must
    # recover the identical placements.
    text = open(path).read()
    text = _re.sub(
        r"REPRESENTATION_RELATIONSHIP\('','',#(\d+),#(\d+)\)",
        r"REPRESENTATION_RELATIONSHIP('','',#\2,#\1)", text)
    text = _re.sub(
        r"ITEM_DEFINED_TRANSFORMATION\('(i\d+)','',#(\d+),#(\d+)\)",
        r"ITEM_DEFINED_TRANSFORMATION('\1','',#\3,#\2)", text)
    path2 = str(tmp_path / "swapped.stp")
    open(path2, "w").write(text)
    surfs2, meta2 = read_step_assembly(path2, with_structure=True)
    assert len(surfs2) == 2
    by_prod2 = {m["product"]: s for s, m in zip(surfs2, meta2)}
    assert set(by_prod2) == {"skin", "spar"}
    for k in ("skin", "spar"):
        np.testing.assert_allclose(
            by_prod2[k].evaluate(u, u), by_prod[k][0].evaluate(u, u),
            atol=1e-10)

    # structure-less files still return meta (product None)
    from goldfish_tpu.geometry.step_io import write_step_file

    flat = str(tmp_path / "flat.stp")
    write_step_file(flat, [s0])
    fs, fm = read_step_assembly(flat, with_structure=True)
    assert len(fs) == 1 and fm[0]["product"] is None
