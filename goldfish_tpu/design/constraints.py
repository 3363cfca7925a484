"""Linear design-space constraint operators on FFD / surface CP grids.

Constant sparse matrices in the reference (align / pin / regu builders in
GOLDFISH/nonmatching_opt_ffd.py:691-1423 and
GOLDFISH/utils/bsp_utils.py:647-757); here small dense numpy matrices
applied as jnp matmuls inside jitted constraint functions.

Grid dof order is x-fastest (dof = i + j*nx + k*nx*ny), matching
`ijk2dof` (reference: GOLDFISH/nonmatching_opt_ffd.py:6-7).
"""

from __future__ import annotations

import numpy as np

__all__ = ["grid_dof", "align_operator", "align_expansion_operator",
           "pin_operator", "regu_operator"]


def grid_dof(i, j, k, nx, ny):
    """Flat dof of grid index (i, j, k), x-fastest."""
    return i + j * nx + k * nx * ny


def _axes_iter(shape, axis):
    """Yield index tuples sweeping `axis` with the others fixed."""
    nx, ny, nz = shape
    other = [r for a, r in enumerate((range(nx), range(ny), range(nz)))
             if a != axis]
    for b in other[0]:
        for c in other[1]:
            line = []
            for t in range(shape[axis]):
                idx = [b, c]
                idx.insert(axis, t)
                line.append(tuple(idx))
            yield line


def align_operator(shape, axis) -> np.ndarray:
    """Rows force equality of coefficients along the given axis (or
    axes): A @ x = 0  <=>  x constant along each grid line/slab.

    Reference: `set_thopt_align_CPFFD(align_dir)` /
    `dCPaligndCPFFD` (GOLDFISH/nonmatching_opt_ffd.py:1034-1118). The
    emitted rows are linearly INDEPENDENT (first-vs-rest within each
    equivalence group) so SLSQP's meq <= n requirement holds even when
    aligning along several axes at once.
    """
    nx, ny, nz = shape
    axes = (axis,) if np.ndim(axis) == 0 else tuple(axis)
    n = nx * ny * nz
    groups = {}
    for i in range(nx):
        for j in range(ny):
            for k in range(nz):
                key = tuple(c for a, c in enumerate((i, j, k))
                            if a not in axes)
                groups.setdefault(key, []).append(grid_dof(i, j, k, nx, ny))
    rows = []
    for dofs in groups.values():
        for other in dofs[1:]:
            r = np.zeros(n)
            r[dofs[0]] = 1.0
            r[other] = -1.0
            rows.append(r)
    return np.stack(rows) if rows else np.zeros((0, n))


def align_expansion_operator(shape, axis):
    """Design -> full EXPANSION form of the alignment constraint: one
    design dof per aligned grid line/slab, broadcast to every member.

    The reference's multi-FFD drivers implement alignment this way
    (CPFFDesign2FullComp expanding the reduced design vector after
    `set_shopt_align_CP_multiFFD`, reference: demos_om/shape_opt_mint/
    tube/tube_shopt_mi_4patch_wffd.py:86-92 + nonmatching_opt_ffd.py
    :184-428) rather than as the A @ x = 0 equality rows of
    `align_operator` — the design space simply has fewer dofs. Returns
    (A, reps): A is (n_full, n_design); `reps` are the representative
    full-grid dofs (x-fastest order) whose initial values seed the
    design vector (x_full0[reps] == design0)."""
    nx, ny, nz = shape
    axes = (axis,) if np.ndim(axis) == 0 else tuple(axis)
    n = nx * ny * nz
    groups = {}
    order = []
    for k in range(nz):
        for j in range(ny):
            for i in range(nx):
                key = tuple(c for a, c in enumerate((i, j, k))
                            if a not in axes)
                if key not in groups:
                    groups[key] = []
                    order.append(key)
                groups[key].append(grid_dof(i, j, k, nx, ny))
    A = np.zeros((n, len(order)))
    reps = np.empty(len(order), dtype=int)
    for col, key in enumerate(order):
        dofs = groups[key]
        A[dofs, col] = 1.0
        reps[col] = dofs[0]
    return A, reps


def pin_operator(shape, pinned) -> np.ndarray:
    """Selection rows for pinned grid dofs; constraint is
    P @ x = P @ x0 (reference: `CPpinDoFs`/`dCPpindCPFFD`,
    GOLDFISH/nonmatching_opt_ffd.py:1120-1204). `pinned` is an iterable
    of (i, j, k) triples or flat dofs."""
    nx, ny, nz = shape
    n = nx * ny * nz
    rows = []
    for p in pinned:
        d = grid_dof(*p, nx, ny) if np.ndim(p) else int(p)
        r = np.zeros(n)
        r[d] = 1.0
        rows.append(r)
    return np.stack(rows) if rows else np.zeros((0, n))


def regu_operator(shape, axis) -> np.ndarray:
    """First-difference rows along `axis`:
    (D @ x)_m = x_{t+1} - x_t; used as D @ x >= eps to keep CP spacing
    monotone/non-degenerate (reference: `set_shopt_regu_CPFFD` /
    `dCPregudCPFFD`, GOLDFISH/nonmatching_opt_ffd.py:870-883,
    1206-1244)."""
    nx, ny, nz = shape
    rows = []
    for line in _axes_iter(shape, axis):
        for a, b in zip(line[:-1], line[1:]):
            r = np.zeros(nx * ny * nz)
            r[grid_dof(*b, nx, ny)] = 1.0
            r[grid_dof(*a, nx, ny)] = -1.0
            rows.append(r)
    return np.stack(rows) if rows else np.zeros((0, nx * ny * nz))
