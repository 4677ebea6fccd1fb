#!/usr/bin/env python3
"""
Amplitude-sharded engine evidence harness (SURVEY.md §5.7 — the
reference's "scale beyond one simulator" axis; its studies stop at Q10
on one host, reference scripts/reproduce_circuit.sh:33).

Multi-chip hardware is not available here, so this does what CAN be
validated without it, on the 8-device virtual CPU mesh
(xla_force_host_platform_device_count):

  1. correctness — sharded(fused) expectation == single-device fused
     engine at Q12 (beyond the dense path's comfort zone);
  2. capacity — forward at Q16/Q18/Q20 across 8 shards executes
     (amplitudes per device: 2^(n-3); Q20 = 1 MiB-amplitude state);
  3. traffic — the analytic ICI model (sharded_collective_counts) per
     config, the number that determines real-TPU scaling: bytes moved
     per sample per forward vs the ~45 GB/s/link v5e ICI.

Emits one JSON line per row; `--table` prints the markdown for
docs/BENCHMARKS.md.  CPU wall-times are NOT TPU predictions and are
reported only to show the run really executed.
"""
import argparse
import json
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import mesh_utils  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from quanonet_tpu.ops.hamiltonian import simple_ham_diag  # noqa: E402
from quanonet_tpu.ops.hea import hea_expectation, quanonet_spec  # noqa: E402
from quanonet_tpu.parallel.amplitude import (  # noqa: E402
    make_sharded_hea, sharded_collective_counts,
)

ICI_GBPS = 45e9  # one v5e ICI link direction, bytes/s (public spec)


def row(nq, net, batch, n_dev, check_single):
    spec = quanonet_spec(nq, net)
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.uniform(-np.pi, np.pi,
                                spec.weight_shape()).astype(np.float32))
    x = jnp.asarray(rng.uniform(-2, 2,
                                (batch, spec.total_encode)).astype(np.float32))
    diag = jnp.asarray(simple_ham_diag(nq, -5, 5))

    devs = mesh_utils.create_device_mesh((n_dev,),
                                         devices=jax.devices()[:n_dev])
    mesh = Mesh(devs, ("amp",))
    f = make_sharded_hea(spec, mesh, fused=True)
    t0 = time.time()
    out = np.asarray(f(w, x, diag))
    wall = time.time() - t0

    max_err = None
    if check_single:
        ref = np.asarray(hea_expectation(spec, w, x, diag=diag,
                                         engine="fused"))
        max_err = float(np.max(np.abs(out - ref)))
        assert max_err < 1e-4, f"Q{nq} sharded/single mismatch {max_err}"

    tr = sharded_collective_counts(spec, n_dev)
    # time for ONE sample's forward traffic to cross one ICI link,
    # if every ppermute were serialized (worst case, zero overlap)
    ici_us = tr["bytes_per_sample"] / ICI_GBPS * 1e6
    return {
        "qubits": nq, "net_size": list(net), "batch": batch,
        "devices": n_dev, "local_amplitudes": 2 ** nq // n_dev,
        "ppermutes_per_fwd": tr["ppermutes"],
        "ici_bytes_per_sample": tr["bytes_per_sample"],
        "ici_us_per_sample_serialized": round(ici_us, 2),
        "max_err_vs_single_device": max_err,
        "cpu_wall_s": round(wall, 2),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", action="store_true")
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    # (qubits, net, batch, validate-vs-single-device?)
    cases = [
        (12, (4, 2, 4, 2), 8, True),
        (16, (4, 2, 4, 2), 4, False),
        (18, (2, 2, 2, 2), 2, False),
        (20, (2, 2, 2, 2), 1, False),
    ]
    if args.quick:
        cases = cases[:2]
    rows = []
    for nq, net, batch, check in cases:
        r = row(nq, net, batch, 8, check)
        rows.append(r)
        print(json.dumps(r), flush=True)

    if args.table:
        print("\n| Qubits | State/device | ppermutes/fwd | ICI bytes/sample "
              "| serialized ICI µs/sample | vs single-device |")
        print("|---|---|---|---|---|---|")
        for r in rows:
            err = ("≤{:.0e}".format(r["max_err_vs_single_device"])
                   if r["max_err_vs_single_device"] is not None
                   else "—(capacity run)")
            print(f"| {r['qubits']} | 2^{r['qubits']}/8 = "
                  f"{r['local_amplitudes']:,} | {r['ppermutes_per_fwd']} | "
                  f"{r['ici_bytes_per_sample']:,} | "
                  f"{r['ici_us_per_sample_serialized']} | {err} |")


if __name__ == "__main__":
    main()
