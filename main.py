#!/usr/bin/env python
"""Entry point: python main.py -c <config.py> (reference main.py:42-69 parity)."""
from adaptive_tpu.main import main

if __name__ == "__main__":
    main()
