"""
Minimal production serving for trained checkpoints — an HTTP JSON
endpoint over the inference API (quanonet_tpu/infer.py), built for the
TPU's compilation model:

* **Shape buckets, not raw shapes.**  Every request batch is padded up
  to the next power-of-two bucket (capped at --max_batch) before hitting
  the jitted forward, so an arbitrary stream of request sizes executes
  against a small FIXED set of compiled programs — no mid-traffic
  recompiles (each new shape would cost seconds locally and ~minutes
  over a TPU tunnel).  All buckets are compiled once at startup
  (--warmup, default on), so the first real request is already fast.
* **Stateless pure-function serving**: params live on device once;
  requests are data-only (jit arguments, never closed over).

Beyond-reference capability: the reference has no serving path at all
(its inference is a batch CLI).

CLI:  quanonet-serve --ckpt <best_model.npz|.ckpt> --branch_in 100
          [--trunk_in 2] [--port 8777] [--max_batch 8192] [--shots N]
          [--noise_p P] [...]
API:  POST /predict   {"branch": [[...], ...], "trunk": [[...], ...]}
                      -> {"pred": [[...], ...], "n": N, "buckets": [B, ...]}
                      (one bucket per executed chunk; bodies over the
                      size cap get 413)
      GET  /healthz   -> {"ok": true}
      GET  /info      -> model config + bucket sizes + request counters

The handler is threaded (ThreadingHTTPServer) but the device executes
one program at a time — JAX dispatch is thread-safe, so concurrent
requests simply queue on the device, which is the right behavior for a
single-chip server.
"""
import argparse
import json
import os
import sys
import threading
import time

import numpy as np

from quanonet_tpu.infer import load_model


def _buckets(max_batch):
    """Power-of-two bucket ladder 1,2,4,...,max_batch (inclusive)."""
    out, b = [], 1
    while b < max_batch:
        out.append(b)
        b *= 2
    out.append(max_batch)
    return out


class Predictor:
    """Bucketed, recompile-free predictions over a loaded checkpoint."""

    def __init__(self, ckpt_path, branch_in, trunk_in=0, max_batch=8192,
                 shot_seed=0, **overrides):
        import jax

        # persistent XLA cache: a server restart must not recompile all
        # warmup buckets from scratch (~200s/shape cold over the TPU
        # tunnel, ~15s cached — CLAUDE.md)
        from quanonet_tpu.solver import enable_compilation_cache
        enable_compilation_cache()

        self.model, self.params, self.cfg = load_model(
            ckpt_path, branch_in, trunk_in, **overrides)
        self.branch_in = branch_in
        self.trunk_in = trunk_in
        self.max_batch = int(max_batch)
        self.buckets = _buckets(self.max_batch)
        self.shot_seed = shot_seed
        self.requests = 0
        self.rows = 0
        self._lock = threading.Lock()

        # ONE persistent jitted forward (infer.predict re-jits a fresh
        # lambda per call — fine for a batch CLI, a per-request tracing
        # tax for a server).  Params are jit ARGUMENTS (never closed
        # over — tunnel rule) and live on device across requests.
        from quanonet_tpu.ops.noise import is_noisy
        m = self.model
        noisy = is_noisy(
            getattr(m, 'noise_p', None), getattr(m, 'readout_p', None),
            getattr(m, 'damp_gamma', None), getattr(m, 'dephase_p', None))
        self._sampled = bool(getattr(m, 'shots', None)) or noisy
        self._rng_name = 'noise' if noisy else 'shots'
        mt = self.cfg.get('model_type', 'QuanONet')
        self._two_input = trunk_in > 0 and mt in ('QuanONet', 'DeepONet')
        self._concat = trunk_in > 0 and mt == 'FNN'

        if self._sampled:
            def fwd(params, key, *inp):
                return m.apply(params, *inp, rngs={self._rng_name: key})
        else:
            def fwd(params, *inp):
                return m.apply(params, *inp)
        self._fwd = jax.jit(fwd)
        self._params_dev = jax.device_put(self.params)
        self._key = jax.random.PRNGKey(shot_seed)
        self._fold = jax.jit(jax.random.fold_in)
        self._req_counter = 0

    def _bucket(self, n):
        for b in self.buckets:
            if n <= b:
                return b
        return self.max_batch

    def buckets_for(self, n):
        """The bucket each executed chunk of an n-row request pads to
        (requests larger than max_batch run several programs)."""
        return [self._bucket(min(self.max_batch, n - s))
                for s in range(0, max(n, 1), self.max_batch)]

    def predict(self, branch, trunk=None):
        """branch (n, branch_in) float32; trunk (n, trunk_in) or None.
        Pads to the bucket size, runs the fixed-shape program, slices."""
        branch = np.asarray(branch, np.float32)
        if branch.ndim != 2 or branch.shape[1] != self.branch_in:
            raise ValueError(
                f"branch must be (n, {self.branch_in}), got {branch.shape}")
        n = branch.shape[0]
        if (self._two_input or self._concat) and trunk is None:
            # never silently zero-fill a REQUIRED input: a client that
            # forgets the trunk would get confidently wrong predictions
            raise ValueError(
                f"model expects a trunk input (trunk_in={self.trunk_in})")
        if trunk is not None:
            trunk = np.asarray(trunk, np.float32)
            if trunk.shape != (n, self.trunk_in):
                raise ValueError(
                    f"trunk must be ({n}, {self.trunk_in}), "
                    f"got {trunk.shape}")
        preds = []
        for s in range(0, n, self.max_batch):
            nb = min(self.max_batch, n - s)
            out = self._run_bucket(branch[s:s + nb],
                                   None if trunk is None
                                   else trunk[s:s + nb])
            preds.append(out)
        with self._lock:
            self.requests += 1
            self.rows += n
        return np.concatenate(preds, axis=0)

    def _run_bucket(self, branch, trunk):
        """Pad one ≤max_batch slice to its bucket, run the persistent
        jitted forward, slice the padding back off."""
        nb = branch.shape[0]
        b = self._bucket(nb)
        bp = np.zeros((b, self.branch_in), np.float32)
        bp[:nb] = branch
        if self._two_input:
            tp = np.zeros((b, self.trunk_in), np.float32)
            if trunk is not None:
                tp[:nb] = trunk
            inp = (bp, tp)
        elif self._concat:
            tp = np.zeros((b, self.trunk_in), np.float32)
            if trunk is not None:
                tp[:nb] = trunk
            inp = (np.concatenate([bp, tp], axis=1),)
        else:
            inp = (bp,)
        if self._sampled:
            with self._lock:
                self._req_counter += 1
                k = self._fold(self._key, self._req_counter)
            out = self._fwd(self._params_dev, k, *inp)
        else:
            out = self._fwd(self._params_dev, *inp)
        return np.asarray(out)[:nb]

    def warmup(self):
        """Compile every bucket once so live traffic never recompiles."""
        t0 = time.time()
        for b in self.buckets:
            bp = np.zeros((b, self.branch_in), np.float32)
            tp = (np.zeros((b, self.trunk_in), np.float32)
                  if self.trunk_in else None)
            self._run_bucket(bp, tp)
        return time.time() - t0

    def info(self):
        cfg = {k: v for k, v in self.cfg.items()
               if isinstance(v, (str, int, float, bool, list, tuple))
               or v is None}
        with self._lock:
            counters = dict(requests=self.requests, rows=self.rows)
        return dict(model_type=self.cfg.get('model_type'),
                    branch_in=self.branch_in, trunk_in=self.trunk_in,
                    buckets=self.buckets, config=cfg, **counters)


def make_server(pred: Predictor, host='127.0.0.1', port=8777,
                max_body_bytes=None):
    """Build (not start) a ThreadingHTTPServer wired to the predictor.

    max_body_bytes caps POST bodies (413 beyond it) so one oversized
    JSON payload can't exhaust memory; the default budgets ~32 bytes of
    JSON text per input float for a full max_batch request, floored at
    8 MiB.  The endpoint is UNAUTHENTICATED — bind loopback (default)
    unless the network is trusted."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    if max_body_bytes is None:
        row_floats = pred.branch_in + max(pred.trunk_in, 0) + 1
        max_body_bytes = max(8 << 20, 32 * row_floats * pred.max_batch)

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header('Content-Type', 'application/json')
            self.send_header('Content-Length', str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == '/healthz':
                self._send(200, {"ok": True})
            elif self.path == '/info':
                self._send(200, pred.info())
            else:
                self._send(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            if self.path != '/predict':
                self._send(404, {"error": f"unknown path {self.path}"})
                return
            try:
                length = int(self.headers.get('Content-Length', 0))
                if length > max_body_bytes:
                    self._send(413, {"error":
                                     f"request body {length} bytes exceeds "
                                     f"the {max_body_bytes}-byte cap "
                                     f"(split the batch across requests)"})
                    return
                req = json.loads(self.rfile.read(length))
                branch = req['branch']
                trunk = req.get('trunk')
                n = len(branch)
                out = pred.predict(branch, trunk)
                self._send(200, {"pred": out.tolist(), "n": n,
                                 "buckets": pred.buckets_for(n)})
            except (KeyError, ValueError, TypeError) as e:
                self._send(400, {"error": str(e)})
            except Exception as e:   # keep the server alive on bad input
                self._send(500, {"error": f"{type(e).__name__}: {e}"})

        def log_message(self, fmt, *args):  # quiet access log -> stderr
            print(f"[serve] {self.address_string()} {fmt % args}",
                  file=sys.stderr)

    return ThreadingHTTPServer((host, port), Handler)


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="Serve a trained QuanONet checkpoint over HTTP")
    ap.add_argument('--ckpt', required=True)
    ap.add_argument('--branch_in', type=int, required=True)
    ap.add_argument('--trunk_in', type=int, default=0)
    ap.add_argument('--host', default='127.0.0.1',
                    help='bind address; the endpoint is UNAUTHENTICATED — '
                         'anything beyond the loopback default exposes '
                         'predictions to the whole network')
    ap.add_argument('--port', type=int, default=8777)
    ap.add_argument('--max_batch', type=int, default=8192)
    ap.add_argument('--no_warmup', action='store_true')
    ap.add_argument('--shots', type=int, default=None,
                    help='finite-shot readout emulation (ops/sampling.py)')
    ap.add_argument('--noise_p', type=float, default=None,
                    help='noisy inference via Pauli trajectories')
    ap.add_argument('--readout_p', type=float, default=None)
    ap.add_argument('--noise_traj', type=int, default=None)
    args = ap.parse_args(argv)

    overrides = {k: getattr(args, k) for k in
                 ('shots', 'noise_p', 'readout_p', 'noise_traj')
                 if getattr(args, k) is not None}
    pred = Predictor(args.ckpt, args.branch_in, args.trunk_in,
                     max_batch=args.max_batch, **overrides)
    if not args.no_warmup:
        print(f"[serve] warming {len(pred.buckets)} buckets "
              f"(max {args.max_batch})...", flush=True)
        dt = pred.warmup()
        print(f"[serve] warmup done in {dt:.1f}s", flush=True)
    srv = make_server(pred, args.host, args.port)
    print(f"[serve] listening on http://{args.host}:{srv.server_port} "
          f"(POST /predict, GET /healthz, GET /info)", flush=True)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        print("[serve] shutting down")
        srv.shutdown()
    return 0


if __name__ == '__main__':
    raise SystemExit(main())
