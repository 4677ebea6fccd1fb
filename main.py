#!/usr/bin/env python3
"""
QuanONet-TPU main entry point (reference main.py:16-125, CLI-compatible).

Thin shim over quanonet_tpu.cli so the reference's
``python main.py --operator X --model_type Y`` invocations (and its
reproduce_*.sh sweep scripts) run unchanged from a source checkout; a
pip-installed package exposes the same thing as ``quanonet-train``.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from quanonet_tpu.cli import main

if __name__ == "__main__":
    main()
