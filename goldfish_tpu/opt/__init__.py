from goldfish_tpu.opt.problem import OptProblem, OptResult  # noqa: F401
from goldfish_tpu.opt.warmstart import SecantWarmStart  # noqa: F401
