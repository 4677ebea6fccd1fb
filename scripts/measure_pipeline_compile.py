#!/usr/bin/env python3
"""
Measure the stage-local-compile claim of parallel/pipeline.py: with
uniform block structure, the SPMD pipeline program contains ONE
sub-spec unitary-compile (nb/P blocks) instead of the whole chain
(nb blocks), so trace+compile cost and compiled-program size scale
~1/P in the unitary-compile component.

Runs on the virtual CPU mesh (no TPU needed — compile cost is a
host-side property of the lowered program).  Prints one JSON line:

  {"nb": .., "P": .., "stage_local": {"compile_s": .., "hlo_kb": ..},
   "fallback": {"compile_s": .., "hlo_kb": ..}, "dense": {...}}
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

from quanonet_tpu.ops import hea as _hea  # noqa: E402
from quanonet_tpu.parallel.pipeline import make_pipeline_hea  # noqa: E402


def _measure(fn, args):
    """(trace+lower seconds, compile seconds, optimized HLO size KiB)."""
    t0 = time.perf_counter()
    low = jax.jit(fn).lower(*args)
    t1 = time.perf_counter()
    comp = low.compile()
    t2 = time.perf_counter()
    try:
        kb = len(comp.as_text()) / 1024.0
    except Exception:
        kb = float("nan")
    return t1 - t0, t2 - t1, kb


def main():
    # circuit-study scale: Q5, HB=HT=20 -> 40+20? use (20,2,20,2): 40 blocks?
    # quanonet_spec net = (branch_depth, branch_ld, trunk_depth, trunk_ld);
    # HB=HT=20 + the double-encode layout gives 40 blocks; pick 64 blocks so
    # nb divides the 8-way pipe cleanly and the chain is deep.
    spec = _hea.heaqnn_spec(5, (64, 2))
    nb = spec.n_blocks
    P_SIZE = 8
    batch = 64
    key = jax.random.PRNGKey(0)
    w = _hea.init_ansatz_weights(key, spec)
    x = jax.random.uniform(key, (batch, spec.total_encode), minval=-1.0)
    diag = np.asarray(np.linspace(-1, 1, spec.dim), np.float32)

    mesh = Mesh(np.array(jax.devices()[:P_SIZE]), ("pipe",))
    out = {"nb": nb, "P": P_SIZE}
    with mesh:
        for label, slc in (("stage_local", True), ("fallback", False)):
            fn = make_pipeline_hea(spec, mesh, stage_local_compile=slc)
            tr, co, kb = _measure(fn, (w, x, diag))
            jf = jax.jit(fn)
            float(jf(w, x, diag).sum())  # warm
            reps = 20
            t0 = time.perf_counter()
            for _ in range(reps):
                r = jf(w, x, diag)
            float(r.sum())
            step_ms = (time.perf_counter() - t0) / reps * 1e3
            out[label] = {"trace_s": round(tr, 2), "compile_s": round(co, 2),
                          "hlo_kb": round(kb, 1), "step_ms": round(step_ms, 2)}

    def dense(wgt, xx, dg):
        sr, si = _hea.hea_forward_pair(spec, wgt, xx, engine="dense")
        return _hea.diag_expectation_pair(sr, si, dg)

    tr, co, kb = _measure(dense, (w, x, diag))
    out["dense_1dev"] = {"trace_s": round(tr, 2), "compile_s": round(co, 2),
                         "hlo_kb": round(kb, 1)}

    # numerical check: both pipeline modes agree with dense
    with mesh:
        f_sl = make_pipeline_hea(spec, mesh, stage_local_compile=True)
        got = np.asarray(f_sl(w, x, diag))
    ref = np.asarray(dense(w, x, diag))
    out["max_abs_diff_vs_dense"] = float(np.abs(got - ref).max())

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
