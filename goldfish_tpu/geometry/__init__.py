from goldfish_tpu.geometry.nurbs import NURBS  # noqa: F401
from goldfish_tpu.geometry import cadkit  # noqa: F401
