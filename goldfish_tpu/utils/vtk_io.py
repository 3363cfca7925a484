"""VTK output for shells: sampled surfaces + control nets.

Replaces the reference's ParaView pipeline (FEniCS `File(...pvd)` written
from `create_files`/`save_files`, reference: GOLDFISH/nonmatching_opt.py
:1448-1576, plus `VTKWriter` in utils/ffd_utils.py:164-346): legacy-VTK
structured grids written directly from NURBS evaluations, one file per
patch per snapshot, with displacement / thickness / von Mises point
data. No FEniCS, no ParaView-python dependency for writing.
"""

from __future__ import annotations

import os

import numpy as np

__all__ = ["write_structured_vtk", "write_cp_vtk", "SurfaceWriter"]


def write_structured_vtk(path, points, point_data=None):
    """Legacy-ASCII VTK structured grid.

    points: (n_u, n_v, 3) (surfaces) or (n_u, n_v, n_w, 3) (FFD blocks);
    point_data: dict name -> (n_u, n_v[, n_w]) scalars or (..., 3)
    vectors.
    """
    pts = np.asarray(points, dtype=np.float64)
    if pts.ndim == 3:
        pts = pts[:, :, None, :]
    nu, nv, nw, _ = pts.shape
    n = nu * nv * nw
    # VTK structured grids index x fastest
    order = pts.transpose(2, 1, 0, 3).reshape(-1, 3)
    lines = [
        "# vtk DataFile Version 3.0",
        "goldfish_tpu surface",
        "ASCII",
        "DATASET STRUCTURED_GRID",
        f"DIMENSIONS {nu} {nv} {nw}",
        f"POINTS {n} double",
    ]
    lines += [" ".join(f"{x:.16g}" for x in row) for row in order]
    if point_data:
        lines.append(f"POINT_DATA {n}")
        for name, arr in point_data.items():
            a = np.asarray(arr, dtype=np.float64)
            is_vector = a.shape[-1] == 3 and a.ndim >= 3
            if is_vector:
                if a.ndim == 3:  # (nu, nv, 3) -> (nu, nv, 1, 3)
                    a = a[:, :, None, :]
                flat = a.transpose(2, 1, 0, 3).reshape(-1, 3)
                lines.append(f"VECTORS {name} double")
                lines += [" ".join(f"{x:.16g}" for x in r) for r in flat]
            else:
                if a.ndim == 2:  # (nu, nv) -> (nu, nv, 1)
                    a = a[:, :, None]
                flat = a.transpose(2, 1, 0).reshape(-1)
                lines += [f"SCALARS {name} double 1",
                          "LOOKUP_TABLE default"]
                lines += [f"{x:.16g}" for x in flat]
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def write_cp_vtk(path, control_points):
    """Control-net output (reference VTKWriter.write_cp)."""
    cp = np.asarray(control_points, dtype=np.float64)
    if cp.shape[-1] == 4:
        cp = cp[..., :3] / cp[..., 3:4]
    write_structured_vtk(path, cp)


class SurfaceWriter:
    """Per-major-iteration snapshot writer (the role of the reference's
    create_files/save_files called from DispStatesComp.linearize,
    reference: om_comps/disp_states_comp.py:100-105)."""

    def __init__(self, system, save_path="./results", n_eval=33):
        self.system = system
        self.save_path = save_path
        self.n_eval = n_eval
        self.counter = 0

    def save(self, d=None, h=None, tag=None):

        from goldfish_tpu.ops.bspline import rational_basis_2d

        tag = self.counter if tag is None else tag
        u = np.linspace(0, 1, self.n_eval)
        for ip, meta in enumerate(self.system.metas):
            s = meta.surf
            X = s.evaluate(u, u)
            data = {}
            grid = np.stack(np.meshgrid(u, u, indexing="ij"), -1).reshape(-1, 2)
            conn, tab = rational_basis_2d(
                s.knots[0], s.knots[1], *s.degree, s.weights, grid, nd=0)
            if d is not None:
                dloc = np.asarray(d[ip])[conn]
                disp = np.einsum("nl,nlk->nk", tab[(0, 0)], dloc)
                data["displacement"] = disp.reshape(self.n_eval,
                                                    self.n_eval, 3)
            if h is not None:
                hloc = np.asarray(h[ip])[conn]
                th = np.einsum("nl,nl->n", tab[(0, 0)], hloc)
                data["thickness"] = th.reshape(self.n_eval, self.n_eval)
            write_structured_vtk(
                os.path.join(self.save_path,
                             f"surf{ip}_iter{tag}.vtk"), X, data)
        self.counter += 1
