#!/usr/bin/env python
"""
Serving-path benchmark: per-bucket request latency and sustained
throughput of quanonet_tpu.serve.Predictor on the current backend, plus
the HTTP layer's overhead (loopback round-trip vs direct call).

Writes docs/serving.json and prints a human summary.  On the tunneled
TPU every program dispatch carries a ~35 ms fixed RPC floor (CLAUDE.md)
— that floor is a property of this tunnel, not of TPU serving, so the
numbers separate:

  latency_ms       median end-to-end Predictor.predict wall per request
  rows_per_sec     bucket_size / latency — the sustained rate when
                   clients batch at that size
  http_overhead_ms loopback HTTP round-trip minus direct-call latency
                   (JSON encode/decode + socket), measured at bucket 64

Run: python scripts/bench_serve.py [--ckpt ...] [--max_batch 8192]
     [--reps 20] [--cpu]
"""
import argparse
import json
import os
import statistics
import sys
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_CKPT = os.path.join(
    REPO, 'pretrained_weights/Antideriv/'
    'Antideriv_QuanONet_Net5-1-5-1_Q2_TF_S0.001_1000x100_Seed0/'
    'best_model.npz')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--ckpt', default=DEFAULT_CKPT)
    ap.add_argument('--branch_in', type=int, default=10)
    ap.add_argument('--trunk_in', type=int, default=1)
    ap.add_argument('--max_batch', type=int, default=8192)
    ap.add_argument('--reps', type=int, default=20)
    ap.add_argument('--cpu', action='store_true')
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')
    from quanonet_tpu.serve import Predictor, make_server

    pred = Predictor(args.ckpt, args.branch_in, args.trunk_in,
                     max_batch=args.max_batch)
    platform = jax.devices()[0].platform
    print(f"platform: {platform}; warming {len(pred.buckets)} buckets...",
          flush=True)
    dt = pred.warmup()
    print(f"warmup {dt:.1f}s", flush=True)

    rng = np.random.RandomState(0)
    rows = []
    for b in pred.buckets:
        branch = rng.randn(b, args.branch_in).astype(np.float32)
        trunk = rng.rand(b, args.trunk_in).astype(np.float32)
        # one untimed call (bucket already compiled; primes any lazy state)
        pred.predict(branch, trunk)
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = pred.predict(branch, trunk)
            # predict() returns a NumPy array -> the device work is done
            _ = float(out[0, 0])
            times.append(time.perf_counter() - t0)
        lat = statistics.median(times)
        rows.append(dict(bucket=b, latency_ms=round(lat * 1e3, 3),
                         rows_per_sec=round(b / lat, 1)))
        print(f"  bucket {b:>6}: {lat * 1e3:8.2f} ms/request  "
              f"{b / lat:12,.0f} rows/s", flush=True)

    # HTTP layer overhead at a mid-size bucket over loopback
    srv = make_server(pred, host='127.0.0.1', port=0)
    port = srv.server_port
    thr = threading.Thread(target=srv.serve_forever, daemon=True)
    thr.start()
    b = min(64, args.max_batch)
    branch = rng.randn(b, args.branch_in).astype(np.float32)
    trunk = rng.rand(b, args.trunk_in).astype(np.float32)
    payload = json.dumps({"branch": branch.tolist(),
                          "trunk": trunk.tolist()}).encode()
    direct = statistics.median(
        [_timeit(lambda: pred.predict(branch, trunk)) for _ in range(10)])
    http = statistics.median(
        [_timeit(lambda: urllib.request.urlopen(
            urllib.request.Request(
                f'http://127.0.0.1:{port}/predict', data=payload,
                headers={'Content-Type': 'application/json'}),
            timeout=60).read()) for _ in range(10)])
    srv.shutdown()
    overhead_ms = (http - direct) * 1e3

    out = dict(platform=platform, ckpt=os.path.basename(args.ckpt),
               max_batch=args.max_batch, reps=args.reps,
               warmup_s=round(dt, 1), buckets=rows,
               http_overhead_ms_at_64=round(overhead_ms, 2))
    path = os.path.join(REPO, 'docs', 'serving.json')
    with open(path, 'w') as f:
        json.dump(out, f, indent=1)
    print(f"HTTP loopback overhead at bucket {b}: {overhead_ms:.2f} ms")
    print(f"wrote {path}")


def _timeit(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == '__main__':
    main()
