#!/usr/bin/env python
"""Entry point: python main.py -c <config.py> (reference main.py:42-69 parity)."""
import os

if os.environ.get("JAX_PLATFORMS"):
    # This rig's jax plugin injects "axon,cpu" into jax.config regardless of
    # the env var (see tests/conftest.py:20-23); re-assert the user's choice
    # so `JAX_PLATFORMS=cpu python main.py ...` really runs on CPU.
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from adaptive_tpu.main import main

if __name__ == "__main__":
    main()
