"""GOLDFISH-TPU: TPU-native isogeometric Kirchhoff-Love shell optimization.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
hanzhao2020/GOLDFISH (Gradient-based Optimization and Large-scale Design
Framework for Isogeometric SHells): shape and thickness optimization of
Kirchhoff-Love shell structures built from multiple non-matching
NURBS/B-spline patches, with analytic adjoint sensitivities.

Architecture (vs. the reference's FEniCS/PETSc/MPI stack):

  - NURBS basis evaluation + per-quadrature-point shell energy are batched
    JAX computations (padded/stacked over patches) feeding the TPU MXU/VPU;
    the hot assembly contractions have Pallas kernel implementations.
  - Residuals and every Jacobian/adjoint (dR/du, dR/dCP, dR/dh, dR/dxi)
    come from JAX AD of a single scalar total-energy functional - replacing
    UFL `derivative` + ~1500 lines of hand-built matrix calculus in the
    reference (reference: GOLDFISH/nonmatching_opt.py:941-1341).
  - The blocked PETSc nest-matrix Newton solve becomes a matrix-free
    Newton-Krylov (CG + batched dense block-Jacobi preconditioner) under
    jit; small problems use a dense direct path.
  - MPI data parallelism over patches becomes jax.sharding over a device
    Mesh (patch axis sharded, psum-reduced energies/gradients).
  - OpenMDAO / CSDL adapter layers are preserved API-wise via vendored
    minimal-compatible runtimes in `goldfish_tpu.compat`.
"""

__version__ = "0.1.0"

from goldfish_tpu import config  # noqa: F401

__all__ = ["config", "__version__"]
