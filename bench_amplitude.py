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

`--shard-compute` is the fourth evidence mode and the one that DOES run
on the real chip: it times ONE shard's local computation of an 8-way
(k=3) sharded forward on the single available TPU, via
make_sharded_hea(..., virtual_global=3) — identical local state size
2^(n-3), identical gate/combine arithmetic, partner exchanges replaced
by self-no-ops (VERDICT round-2 item 8: put a *measured* compute side
under the analytic ICI column).
"""
import argparse
import json
import os
import sys
import time

# pre-parse (argparse semantics incl. prefix abbreviation) — the flag
# decides platform env vars that must be set BEFORE jax imports
_pre = argparse.ArgumentParser(add_help=False)
_pre.add_argument("--shard-compute", action="store_true")
_SHARD_COMPUTE = _pre.parse_known_args()[0].shard_compute

if not _SHARD_COMPUTE:
    os.environ.setdefault("XLA_FLAGS",
                          "--xla_force_host_platform_device_count=8")
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

if not _SHARD_COMPUTE:
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


def shard_compute_row(nq, net, batch, k=3, repeats=3):
    """Time ONE shard's local compute of a 2^k-way sharded forward on the
    real TPU (virtual_global mode: same local state 2^(n-k), same
    arithmetic, partner exchanges as self-no-ops).

    The tunnel has a ~35 ms fixed per-call floor (RPC + dispatch), so a
    single-batch wall/batch number overstates small-state rows.  The
    per-sample figure is therefore the SLOPE between two batch sizes
    (batch and batch/16): (t_big - t_small)/(batch - batch/16) — the
    fixed floor cancels exactly.  Timing materializes a dependent host
    value each call (block_until_ready is unreliable over the tunnel,
    CLAUDE.md)."""
    spec = quanonet_spec(nq, net)
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.uniform(-np.pi, np.pi,
                                spec.weight_shape()).astype(np.float32))
    local_dim = 2 ** (nq - k)
    diag_local = jnp.asarray(simple_ham_diag(nq, -5, 5)[:local_dim]
                             .astype(np.float32))
    dev = jax.devices()[0]
    mesh = Mesh(np.asarray([dev]), ("amp",))
    f = make_sharded_hea(spec, mesh, fused=True, virtual_global=k)

    walls = {}
    compile_s = 0.0
    chk = 0.0
    for b in (batch // 16, batch):
        xb = jnp.asarray(rng.uniform(-2, 2, (b, spec.total_encode))
                         .astype(np.float32))
        t0 = time.time()
        chk = float(np.asarray(f(w, xb, diag_local)).sum())   # compile+warm
        compile_s += time.time() - t0
        times = []
        for _ in range(repeats):
            t0 = time.time()
            chk = float(np.asarray(f(w, xb, diag_local)).sum())
            times.append(time.time() - t0)
        walls[b] = min(times)
    slope = (walls[batch] - walls[batch // 16]) / (batch - batch // 16)
    tr = sharded_collective_counts(spec, 2 ** k)
    ici_us = tr["bytes_per_sample"] / ICI_GBPS * 1e6
    return {
        "qubits": nq, "net_size": list(net), "batch": batch,
        "shards": 2 ** k, "local_amplitudes": local_dim,
        "platform": jax.devices()[0].platform,
        "compile_s": round(compile_s, 1),
        "per_shard_compute_us_per_sample": round(slope * 1e6, 2),
        "ici_us_per_sample_serialized": round(ici_us, 2),
        "call_wall_s": {b: round(t, 4) for b, t in walls.items()},
        "check": chk,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", action="store_true")
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--shard-compute", action="store_true")
    args = ap.parse_args()

    if args.shard_compute:
        # (qubits, net, batch) — batch sized so one call is compute-
        # dominated: the tunnel shows a ~35 ms fixed per-call floor
        # (RPC + dispatch), so calls must run >=300 ms to measure the
        # per-sample compute rather than the floor
        cases = [
            (12, (4, 2, 4, 2), 16384),
            (16, (4, 2, 4, 2), 2048),
            (18, (2, 2, 2, 2), 512),
            (20, (2, 2, 2, 2), 128),
        ]
        if args.quick:
            cases = cases[:1]
        rows = []
        for nq, net, batch in cases:
            r = shard_compute_row(nq, net, batch)
            rows.append(r)
            print(json.dumps(r), flush=True)
        if args.table:
            print("\n| Qubits | local amps/shard (8-way) | per-shard compute "
                  "µs/sample (measured) | serialized ICI µs/sample "
                  "(analytic) |")
            print("|---|---|---|---|")
            for r in rows:
                print(f"| {r['qubits']} | {r['local_amplitudes']:,} | "
                      f"{r['per_shard_compute_us_per_sample']} | "
                      f"{r['ici_us_per_sample_serialized']} |")
        return

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
