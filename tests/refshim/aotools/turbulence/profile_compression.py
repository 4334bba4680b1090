from fast_tpu.models.atmosphere import equivalent_layers  # noqa: F401
