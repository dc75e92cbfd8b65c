from adaptive_tpu.native import mask  # noqa: F401
