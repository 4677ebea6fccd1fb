"""
ctypes bindings for the native host-side datagen library
(native/quanonet_native.cpp).  Auto-builds with `make -C native` on first
use when a compiler is available; degrades to None when not.

Use ``native_ode_solver_available()`` to probe, and
``solve_ode_batch_native`` etc. as drop-in batched solvers (same semantics
as quanonet_tpu/data/device_gen.py, float32, OpenMP-parallel on host).
"""
import ctypes
import os
import subprocess

import numpy as np

# source-checkout default is <repo>/native; a pip-installed package points
# QUANONET_NATIVE_DIR at a checkout (or anywhere the Makefile+.so live) —
# otherwise the loader degrades to the pure-Python/device generators.
_NATIVE_DIR = os.environ.get('QUANONET_NATIVE_DIR') or os.path.join(
    os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), 'native')
_SO_PATH = os.path.join(_NATIVE_DIR, 'libquanonet_native.so')

ODE_KIND = {'Identity': 0, 'Antideriv': 1, 'Homogeneous': 2, 'Nonlinear': 3}

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO_PATH):
        try:
            subprocess.run(['make', '-C', _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None

    f32p = np.ctypeslib.ndpointer(np.float32, flags='C_CONTIGUOUS')
    lib.solve_ode_batch.argtypes = [ctypes.c_int32, f32p, ctypes.c_int32,
                                    ctypes.c_int32, ctypes.c_int32, f32p]
    lib.solve_advection_batch.argtypes = [f32p, ctypes.c_int32,
                                          ctypes.c_int32, f32p]
    lib.solve_rdiffusion_batch.argtypes = [f32p, ctypes.c_int32,
                                           ctypes.c_int32, f32p]
    lib.rdiffusion_cols.argtypes = [ctypes.c_int32]
    lib.rdiffusion_cols.restype = ctypes.c_int32
    lib.native_version.restype = ctypes.c_int32
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load() is not None


def solve_ode_batch_native(operator, u0_full, num_cal):
    """u0_full (batch, n_src) float32 -> (batch, num_cal) RK4 solutions."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    u0 = np.ascontiguousarray(u0_full, np.float32)
    batch, n_src = u0.shape
    out = np.empty((batch, num_cal), np.float32)
    lib.solve_ode_batch(ODE_KIND[operator], u0, batch, n_src, num_cal, out)
    return out


def solve_advection_batch_native(u0_cal):
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    u0 = np.ascontiguousarray(u0_cal, np.float32)
    batch, num_cal = u0.shape
    out = np.empty((batch, num_cal, num_cal), np.float32)
    lib.solve_advection_batch(u0, batch, num_cal, out)
    return out


def solve_rdiffusion_batch_native(u0_cal):
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    u0 = np.ascontiguousarray(u0_cal, np.float32)
    batch, num_cal = u0.shape
    n_cols = _load().rdiffusion_cols(num_cal)
    out = np.empty((batch, num_cal, n_cols), np.float32)
    lib.solve_rdiffusion_batch(u0, batch, num_cal, out)
    return out
