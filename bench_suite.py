#!/usr/bin/env python3
"""
Extended benchmark suite — one JSON line per metric (bench.py remains the
driver's single headline; this widens the evidence):

1. quanonet_q5_advection_train  — the headline (same as bench.py)
2. quanonet_q5_antideriv_train  — the reference README's literal 80-min
   regime (Net20-2-10-2, 1000 epochs x 10,000 samples, README.md:178)
3. quanonet_inference           — demo-scale inference throughput
   (reference README.md:153: 100k points in ~1 min on CPU)
4. datagen_device               — device-side GRF+RK4 functions/sec
   (host SciPy path: ~580 fns/sec)

Run: python bench_suite.py [--quick]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def emit(**kw):
    print(json.dumps(kw), flush=True)


def train_bench(metric, operator, net_size, data_cfg, epochs, timed_epochs,
                baseline_sps, lr=1e-4, batch_size=100, scale=0.1):
    import jax
    import jax.numpy as jnp
    import optax
    from quanonet_tpu.data.manager import DataManager
    from quanonet_tpu.models import QuanONet

    np.random.seed(0)
    data = DataManager(dict(operator=operator, model_type='QuanONet',
                            **data_cfg),
                       data_dir=os.path.join(REPO, 'data')).get_data()
    branch = jnp.asarray(data['train_branch_input'])
    trunk = jnp.asarray(data['train_trunk_input'])
    target = jnp.asarray(data['train_output'])
    n = target.shape[0]
    num_batches = n // batch_size

    model = QuanONet(num_qubits=5, branch_input_size=branch.shape[1],
                     trunk_input_size=trunk.shape[1],
                     net_size=tuple(net_size), scale_coeff=scale,
                     if_trainable_freq=True)
    params = model.init(jax.random.PRNGKey(0), branch[:1], trunk[:1])
    optimizer = optax.adam(lr)
    opt_state = optimizer.init(params)

    def batch_loss(p, b, t, y):
        return jnp.mean((model.apply(p, b, t) - y) ** 2)

    @jax.jit
    def one_epoch(params, opt_state, key, branch, trunk, target):
        idx = jax.random.permutation(key, n)[:num_batches * batch_size]
        idx = idx.reshape(num_batches, batch_size)

        def step(c, bi):
            params, opt_state = c
            loss, grads = jax.value_and_grad(batch_loss)(
                params, branch[bi], trunk[bi], target[bi])
            upd, opt_state = optimizer.update(grads, opt_state, params)
            return (optax.apply_updates(params, upd), opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            step, (params, opt_state), idx)
        return params, opt_state, jnp.mean(losses)

    keys = jax.random.split(jax.random.PRNGKey(1), epochs)
    t0 = time.time()
    params, opt_state, l0 = one_epoch(params, opt_state, keys[0],
                                      branch, trunk, target)
    float(l0)   # value sync: block_until_ready is unreliable on the tunnel
    log(f"[{metric}] compile+first epoch {time.time() - t0:.1f}s")
    t0 = time.time()
    for e in range(1, 1 + timed_epochs):
        params, opt_state, loss = one_epoch(params, opt_state, keys[e],
                                            branch, trunk, target)
    float(loss)   # value sync
    sps = timed_epochs * n / (time.time() - t0)
    for e in range(1 + timed_epochs, epochs):
        params, opt_state, loss = one_epoch(params, opt_state, keys[e],
                                            branch, trunk, target)
    float(loss)

    fwd = jax.jit(lambda b, t: model.apply(params, b, t))
    tb = jnp.asarray(data['test_branch_input'])
    tt = jnp.asarray(data['test_trunk_input'])
    ty = np.asarray(data['test_output'])
    preds = np.concatenate([np.asarray(fwd(tb[s:s + 5000], tt[s:s + 5000]))
                            for s in range(0, tb.shape[0], 5000)])
    rel = float(np.linalg.norm(preds - ty) / (np.linalg.norm(ty) + 1e-8))
    emit(metric=metric, value=round(sps, 1), unit="samples/sec",
         vs_baseline=round(sps / baseline_sps, 2), rel_l2=round(rel, 4),
         epochs=epochs,
         eval_protocol="final-epoch, single seed (bench.py's 3-seed "
                       "best-epoch band is the headline quality number)")
    return params, model, data


def inference_bench(quick):
    import jax
    import jax.numpy as jnp
    from quanonet_tpu.infer import load_model, predict

    ckpt = os.path.join(
        REPO, 'pretrained_weights/Antideriv/'
        'Antideriv_QuanONet_Net5-1-5-1_Q2_TF_S0.001_1000x100_Seed0/'
        'best_model.npz')
    model, params, cfg = load_model(ckpt, branch_in=10, trunk_in=1)
    # per-point rate as the SLOPE between two sizes: the tunnel has a
    # ~35 ms fixed per-call floor (RPC + dispatch) that a single
    # wall/n number absorbs, and the demo-scale 100K-point call computes
    # in ~1 ms — far below the floor — so the workload must be large
    # enough that the size DIFFERENCE is measurable (round-3 findings)
    n = 8_000_000 if not quick else 1_000_000
    rng = np.random.RandomState(0)
    branch = rng.randn(n, 10).astype(np.float32)
    trunk = rng.rand(n, 1).astype(np.float32)
    fwd = jax.jit(lambda b, t: model.apply(params, b, t))
    b = jnp.asarray(branch)
    t = jnp.asarray(trunk)
    n_small = n // 8
    bs, ts = b[:n_small], t[:n_small]
    float(jnp.sum(fwd(b, t)))           # compile + warm (big shape)
    float(jnp.sum(fwd(bs, ts)))         # compile + warm (small shape)
    walls = {}
    for (bb, tt, sz) in ((bs, ts, n_small), (b, t, n)):
        best = float('inf')
        for _ in range(3):
            t0 = time.time()
            float(jnp.sum(fwd(bb, tt)))     # value sync
            best = min(best, time.time() - t0)
        walls[sz] = best
    pps = (n - n_small) / (walls[n] - walls[n_small])
    # reference demo: 100k points in ~1 min on CPU => ~1,667 pts/sec
    emit(metric="quanonet_q2_inference_points_per_sec", value=round(pps),
         unit="points/sec", vs_baseline=round(pps / 1667.0, 1))


def datagen_bench():
    import jax
    from quanonet_tpu.data.device_gen import generate_ode_batch
    key = jax.random.PRNGKey(0)
    import jax.numpy as jnp
    # per-function rate as the SLOPE between two batch sizes — the
    # tunnel's ~35 ms per-call floor swamps small batches (round-3
    # findings); 64K-vs-8K functions makes the difference measurable
    big, small = 65536, 8192

    def run(batch):
        best = float('inf')
        for r in range(3):
            t0 = time.time()
            u0, u = generate_ode_batch(jax.random.PRNGKey(r + 1),
                                       'Antideriv', batch, 100, 100,
                                       num_cal=1000)
            float(jnp.sum(u))           # value sync
            best = min(best, time.time() - t0)
        return best

    for batch in (small, big):          # compile + warm both shapes
        u0, u = generate_ode_batch(key, 'Antideriv', batch, 100, 100,
                                   num_cal=1000)
        float(jnp.sum(u))
    fps = (big - small) / (run(big) - run(small))
    # host SciPy path measures ~580 fns/sec
    emit(metric="datagen_antideriv_functions_per_sec", value=round(fps),
         unit="functions/sec", vs_baseline=round(fps / 580.0, 1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--quick', action='store_true')
    args = ap.parse_args()

    import jax
    jax.config.update('jax_compilation_cache_dir',
                      os.path.join(REPO, '.jax_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    log(f"devices: {jax.devices()}")

    q = args.quick
    # 1. headline (Advection PDE regime)
    train_bench("quanonet_q5_advection_train_samples_per_sec_per_chip",
                'Advection', (40, 2, 20, 2),
                dict(num_train=200 if q else 1000, num_test=100,
                     num_points=100, num_points_0=100,
                     train_sample_num=100, test_sample_num=100),
                epochs=5 if q else 100, timed_epochs=3 if q else 20,
                baseline_sps=2083.0)
    # 2. the README 80-min regime (Antideriv ODE, Net20-2-10-2)
    train_bench("quanonet_q5_antideriv_train_samples_per_sec_per_chip",
                'Antideriv', (20, 2, 10, 2),
                dict(num_train=200 if q else 1000, num_test=100,
                     num_points=100, num_points_0=100,
                     train_sample_num=10, test_sample_num=100),
                epochs=20 if q else 1000, timed_epochs=10 if q else 100,
                baseline_sps=2083.0)
    # 3. inference throughput
    inference_bench(q)
    # 4. device datagen
    datagen_bench()


if __name__ == '__main__':
    main()
