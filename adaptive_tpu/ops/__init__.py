from adaptive_tpu.ops import attention, inits, lstm, preprocess  # noqa: F401
