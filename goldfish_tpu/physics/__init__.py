from goldfish_tpu.physics import kl_shell, coupling, loads  # noqa: F401
