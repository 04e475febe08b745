#!/usr/bin/env python
"""Root-level entry point, CLI-compatible with the reference ``train.py``."""
from gsplat_tpu.train import main

if __name__ == "__main__":
    main()
