#!/usr/bin/env python3
"""Top-level inference CLI shim (reference repo layout has infer.py at the
root).  See quanonet_tpu/infer.py for the implementation."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from quanonet_tpu.infer import evaluate, load_model, main, predict  # noqa

if __name__ == '__main__':
    main()
