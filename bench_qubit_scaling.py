#!/usr/bin/env python3
"""
Qubit-scaling benchmark: train-step and forward throughput as the
Hilbert-space dimension grows (the reference's scale axis, SURVEY.md §5.7
— its studies sweep Q2→Q10; BASELINE.json's stretch config asks for
Q8–Q16 statevectors).

Engines measured per size:
  * Q ≤ 11 : pallas (VMEM fused chain) / dense (XLA block-unitary)
  * Q ≥ 8  : fused (grouped-kron MXU path, ops/fused_gates.py) — the
             large-n route that removes the dense path's O(8^n) cliff
  * Q12–Q16: forward-only in addition to training (capacity probing)

Synthetic data (throughput is data-independent); one program shape per
loop; value-synchronised timing (CLAUDE.md tunnel rules).  Emits one JSON
line per measurement (collected by hand into BENCHMARKS.md's table).
"""
import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
BASELINE_SPS = 2083.0   # Q5 MindQuantum CPU anchor (BASELINE.md) — the
#                         reference would only be SLOWER at larger Q, so
#                         using it for all sizes understates our speedup
V5E_PEAK_BF16 = 197e12  # TPU v5e MXU peak (bf16 FLOP/s), same
#                         denominator bench.py uses for the flagship MFU


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def model_flops_per_sample(n_qubits, net_size, engine, train=True):
    """Analytic model-FLOP count per sample for the grouped-kron HEA
    formulation (the algebra the fused/pfused engines execute,
    ops/fused_gates.py / ops/pallas_fused.py) — NOT the dense O(D^2)
    block-chain model bench.py uses for dense/pallas/embed at Q5.

    Counting convention (complex MAC = 8 real FLOPs; permutations are
    free — the ring is a gather, its one-hot-matmul realization in the
    pfused kernel is an implementation detail, so MFU here measures
    USEFUL arithmetic, understating hardware utilization):

      per sublayer:  low-group complex (D x 128) contraction  8*128*D
                     high group: dense (hi x hi) FMAs          8*hi*D
                       (butterfly mode executes 14*(n-7)*D — less;
                        the dense count is the algebraic contraction)
      per block:     encode diagonal (complex multiply)        8*D
                     2 Hadamards: lanes 2 real matmuls  2*2*2*128*D
                       + high add/sub butterflies       2*4*(n-7)*D
      measurement:   |psi|^2 dot diag                          4*D

    Train steps cost ~3x the forward (activation recompute + cotangent
    chain + weight cotangents — the standard fwd+bwd=3x convention).
    dense/pallas/embed (Q<=11 engines) use bench.py's dense-chain model
    scaled the same way.
    """
    D = 2 ** n_qubits
    bd, bld, td, tld = net_size
    n_blocks = bd + td
    n_sub = bd * bld + td * tld
    if engine in ('dense', 'pallas', 'embed'):
        # bench.py flops_per_sample counts fwd+bwd already (18/24 D^2)
        per_step = (24 if engine == 'embed' else 18) * D * D * n_blocks
        return per_step if train else per_step // 3
    hi = max(D // 128, 1)
    w = min(D, 128)      # lane-group contraction width (D itself for n<7)
    per_sub = 8 * w * D + (8 * hi * D if hi > 1 else 0)
    # Hadamard pair per block: 2 lane matmuls (re+im) + high butterflies
    nh = max(n_qubits - 7, 0)
    per_block = 8 * D + 2 * (2 * 2 * w * D) + 2 * 4 * nh * D
    fwd = n_sub * per_sub + n_blocks * per_block + 4 * D
    return 3 * fwd if train else fwd


def bench_config(n_qubits, net_size, engine, batch, epochs_timed=20,
                 train=True, steps_per_epoch=10):
    import jax
    import jax.numpy as jnp
    import optax
    from quanonet_tpu.models import QuanONet

    rng = np.random.RandomState(0)
    n_in = 100
    n = batch * steps_per_epoch
    branch = jnp.asarray(rng.randn(n, n_in).astype(np.float32))
    trunk = jnp.asarray(rng.rand(n, 2).astype(np.float32))
    target = jnp.asarray(rng.randn(n, 1).astype(np.float32))

    model = QuanONet(num_qubits=n_qubits, branch_input_size=n_in,
                     trunk_input_size=2, net_size=tuple(net_size),
                     scale_coeff=0.1, if_trainable_freq=True, engine=engine)
    params = model.init(jax.random.PRNGKey(0), branch[:1], trunk[:1])

    if not train:
        # one jitted scan over all steps per dispatch — per-call RPC
        # (~5 ms) + fixed floor (~35 ms) would otherwise dominate the
        # small-batch large-Q forward rows (CLAUDE.md tunnel rule:
        # >=10K samples per call or throughput is understated)
        @jax.jit
        def fwd_epoch(p, branch, trunk):
            def step(acc, i):
                s = i * batch
                b = jax.lax.dynamic_slice_in_dim(branch, s, batch)
                t = jax.lax.dynamic_slice_in_dim(trunk, s, batch)
                return acc + jnp.sum(model.apply(p, b, t)), None
            acc, _ = jax.lax.scan(step, 0.0,
                                  jnp.arange(steps_per_epoch))
            return acc

        float(fwd_epoch(params, branch, trunk))    # compile + sync
        t0 = time.time()
        reps = max(epochs_timed, 5)
        for _ in range(reps):
            acc = fwd_epoch(params, branch, trunk)
        float(acc)                                 # value sync
        dt = time.time() - t0
        return reps * n / dt, None

    optimizer = optax.adam(1e-4)
    opt_state = optimizer.init(params)

    def batch_loss(p, b, t, y):
        return jnp.mean((model.apply(p, b, t) - y) ** 2)

    @jax.jit
    def one_epoch(params, opt_state, key, branch, trunk, target):
        idx = jax.random.permutation(key, n).reshape(steps_per_epoch, batch)

        def step(c, bi):
            params, opt_state = c
            loss, grads = jax.value_and_grad(batch_loss)(
                params, branch[bi], trunk[bi], target[bi])
            upd, opt_state = optimizer.update(grads, opt_state, params)
            return (optax.apply_updates(params, upd), opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            step, (params, opt_state), idx)
        return params, opt_state, jnp.mean(losses)

    keys = jax.random.split(jax.random.PRNGKey(1), epochs_timed + 1)
    t0 = time.time()
    params, opt_state, l0 = one_epoch(params, opt_state, keys[0],
                                      branch, trunk, target)
    float(l0)                             # value sync
    compile_s = time.time() - t0
    t0 = time.time()
    for e in range(1, epochs_timed + 1):
        params, opt_state, loss = one_epoch(params, opt_state, keys[e],
                                            branch, trunk, target)
    loss_v = float(loss)                  # value sync
    dt = time.time() - t0
    assert np.isfinite(loss_v)
    return epochs_timed * n / dt, compile_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--quick', action='store_true')
    ap.add_argument('--only', type=int, default=None,
                    help='bench a single qubit count')
    ap.add_argument('--engine', default=None,
                    help='bench a single engine (filters each row)')
    args = ap.parse_args()

    import jax
    jax.config.update('jax_compilation_cache_dir',
                      os.path.join(REPO, '.jax_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    sys.path.insert(0, REPO)
    log(f"devices: {jax.devices()}")

    # (qubits, net_size, engines, batch, train?, steps_per_epoch)
    # steps_per_epoch sizes ONE jitted program; small-Q rows need large
    # programs or the tunnel's per-call RPC latency (~5 ms) dominates and
    # understates throughput ~4x (first harvest measured Q5 pallas 128K
    # at 10 steps/epoch vs 528K via bench.py's 1000-step epochs).
    CONFIGS = [
        (5,  (40, 2, 20, 2), ('pallas', 'embed', 'fused'), 100, True, 200),
        (8,  (40, 2, 20, 2), ('pallas', 'fused', 'pfused'), 100, True, 100),
        (10, (40, 2, 20, 2), ('dense', 'fused', 'pfused'), 100, True, 20),
        (11, (10, 2, 10, 2), ('pfused', 'fused'), 100, True, 20),
        (12, (10, 2, 10, 2), ('fused', 'pfused'), 100, True, 20),
        # fused Q13 measured round 5 (8,732 samples/s; the feared
        # ~30-min compile was in the persistent cache, 4.4 s)
        (13, (10, 2, 10, 2), ('pfused', 'fused'), 100, True, 20),
        # Q14: round-5 butterfly pfused extension (hi=128, bt=8 bwd
        # tiles) vs the fused+remat path
        (14, (5, 2, 5, 2), ('pfused', 'fused'), 32, True, 10),
        # Q16 TRAINS on one chip: fused engine + remat
        # (ops/fused_gates.py:195-213) keeps the backward working set
        # bounded; bs=16 x 2^16 split-real states
        (16, (5, 2, 5, 2), ('fused',), 16, True, 10),
        # Q15/Q16 INFERENCE: the pfused VMEM chain is forward-capable
        # past its Q14 training cap (round-5 probe)
        (15, (5, 2, 5, 2), ('pfused', 'fused'), 16, False, 10),
        (16, (5, 2, 5, 2), ('pfused', 'fused'), 8, False, 10),
    ]
    timed = 3 if args.quick else 20
    rows = []
    for nq, net, engines, batch, train, spe in CONFIGS:
        if args.only and nq != args.only:
            continue
        for eng in engines:
            if args.engine and eng != args.engine:
                continue
            try:
                sps, compile_s = bench_config(nq, net, eng, batch,
                                              epochs_timed=timed,
                                              train=train,
                                              steps_per_epoch=spe)
            except Exception as e:
                log(f"Q{nq} {eng}: FAILED {type(e).__name__}: {e}")
                continue
            fps = model_flops_per_sample(nq, net, eng, train=train)
            tflops = sps * fps / 1e12
            row = {
                "metric": f"qubit_scaling_q{nq}_{eng}"
                          f"{'_train' if train else '_fwd'}",
                "qubits": nq, "engine": eng,
                "net_size": list(net), "batch": batch,
                "mode": "train" if train else "forward",
                "value": round(sps, 1), "unit": "samples/sec",
                "vs_baseline": round(sps / BASELINE_SPS, 2),
                "compile_s": None if compile_s is None
                             else round(compile_s, 1),
                "model_mflops_per_sample": round(fps / 1e6, 3),
                "model_tflops_per_sec": round(tflops, 4),
                "mfu_pct": round(100.0 * tflops * 1e12
                                 / V5E_PEAK_BF16, 4),
            }
            rows.append(row)
            print(json.dumps(row), flush=True)
    # JSON artifact for the docs/BENCHMARKS.md scaling table (partial
    # runs via --only/--engine merge into the existing artifact; --quick
    # never writes — 3-epoch numbers must not replace recorded rows)
    art_path = os.path.join(REPO, 'docs', 'qubit_scaling.json')
    if rows and not args.quick and jax.default_backend() == 'tpu':
        try:
            with open(art_path) as f:
                art = {r['metric']: r for r in json.load(f)['rows']}
        except Exception:
            art = {}
        for r in rows:
            art[r['metric']] = r
        with open(art_path, 'w') as f:
            json.dump({'device': str(jax.devices()[0]),
                       'peak_bf16_flops': V5E_PEAK_BF16,
                       'rows': sorted(art.values(),
                                      key=lambda r: (r['qubits'],
                                                     r['engine']))},
                      f, indent=1)
        log(f"artifact updated: {art_path}")


if __name__ == '__main__':
    main()
