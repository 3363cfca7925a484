from goldfish_tpu.solver.system import NonMatchingSystem, SystemData  # noqa: F401
