from goldfish_tpu.ops import bspline, quadrature, refine  # noqa: F401
