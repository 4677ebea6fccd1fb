#!/usr/bin/env python3
"""
Measured per-shard compute of the amplitude-sharded fused body on REAL
TPU hardware (one shard = one device is runnable today; the 8-way mesh
itself needs 8 chips).

Uses make_sharded_hea(..., virtual_global=3): the single device executes
exactly the LOCAL computation one shard of an 8-way mesh would run —
same 2^(n-3) state slice, same grouped-kron applies, same global-qubit
combine arithmetic — with every partner exchange a no-op.  This is the
measured COMPUTE side of the ICI-traffic table in docs/BENCHMARKS.md
(whose communication side is the analytic sharded_collective_counts
model): overlap-feasibility = per-shard compute per ppermute interval
vs the 45 GB/s link time of one shard exchange.

One program shape per case; lax.scan repetitions inside one jit call
(per-call RPC on the tunnel is ~5 ms); value-synchronised timing.

Usage: python bench_shard_compute.py [--quick] [--table]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run_case(nq, net, batch, iters, k=3):
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from quanonet_tpu.ops.hamiltonian import simple_ham_diag
    from quanonet_tpu.ops.hea import quanonet_spec
    from quanonet_tpu.parallel.amplitude import (
        make_sharded_hea, sharded_collective_counts)

    spec = quanonet_spec(nq, net)
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.uniform(-np.pi, np.pi,
                                spec.weight_shape()).astype(np.float32))
    x = jnp.asarray(rng.uniform(-2, 2,
                                (batch, spec.total_encode))
                    .astype(np.float32))
    local_dim = 2 ** (nq - k)
    diag_local = jnp.asarray(simple_ham_diag(nq, -5, 5)[:local_dim])

    mesh = Mesh(np.array(jax.devices()[:1]), ("amp",))
    f = make_sharded_hea(spec, mesh, fused=True, virtual_global=k)

    @jax.jit
    def reps(w, x, diag):
        def step(c, _):
            out = f(w, x + c * 1e-20, diag)   # dependency: no DCE/reorder
            return jnp.sum(out) * 1e-9, None
        c, _ = jax.lax.scan(step, jnp.float32(0), None, length=iters)
        return c

    t0 = time.time()
    float(reps(w, x, diag_local))             # compile + warm
    log(f"  Q{nq}: compile+warm {time.time() - t0:.1f}s")
    t0 = time.time()
    sync = float(reps(w, x, diag_local))      # value sync
    dt = time.time() - t0
    ms_per_sample = dt / (iters * batch) * 1e3

    tr = sharded_collective_counts(spec, 2 ** k)
    ici_us = tr["bytes_per_sample"] / 45e9 * 1e6
    # compute time available to hide ONE shard exchange: per-sample
    # per-shard compute spread over the ppermute count
    us_per_interval = ms_per_sample * 1e3 / max(tr["ppermutes"], 1)
    shard_xfer_us = (local_dim * 2 * 4) / 45e9 * 1e6   # one exchange
    return {
        "qubits": nq, "net_size": list(net), "batch": batch,
        "shards": 2 ** k, "local_amplitudes": local_dim,
        "per_shard_compute_ms_per_sample": round(ms_per_sample, 4),
        "ppermutes_per_fwd": tr["ppermutes"],
        "compute_us_per_ppermute_interval": round(us_per_interval, 2),
        "one_shard_exchange_us": round(shard_xfer_us, 2),
        "compute_hides_comm": bool(us_per_interval > shard_xfer_us),
        "ici_us_per_sample_serialized": round(ici_us, 2),
        "sync": sync,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--table", action="store_true")
    ap.add_argument("--out", default=os.path.join(REPO, "docs",
                                                  "shard_compute.json"))
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    sys.path.insert(0, REPO)
    log(f"devices: {jax.devices()}")

    cases = [  # (qubits, net, batch, iters) — mirrors the ICI table rows
        (12, (4, 2, 4, 2), 32, 100),
        (16, (4, 2, 4, 2), 16, 30),
        (18, (2, 2, 2, 2), 8, 20),
        (20, (2, 2, 2, 2), 8, 10),
    ]
    if args.quick:
        cases = cases[:1]
    rows = []
    for nq, net, batch, iters in cases:
        r = run_case(nq, net, batch, iters)
        rows.append(r)
        print(json.dumps(r), flush=True)

    with open(args.out, "w") as fh:
        json.dump(rows, fh, indent=2)
    log(f"wrote {args.out}")

    if args.table:
        print("\n| Qubits | State/shard | per-shard compute ms/sample "
              "(measured v5e) | compute µs per ppermute interval | one "
              "exchange µs | compute hides comm? |")
        print("|---|---|---|---|---|---|")
        for r in rows:
            print(f"| {r['qubits']} | {r['local_amplitudes']:,} | "
                  f"{r['per_shard_compute_ms_per_sample']} | "
                  f"{r['compute_us_per_ppermute_interval']} | "
                  f"{r['one_shard_exchange_us']} | "
                  f"{'yes' if r['compute_hides_comm'] else 'no'} |")


if __name__ == "__main__":
    main()
