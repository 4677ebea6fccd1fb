"""
Multi-seed vmapped training — a TPU-native capability replacing the
reference's multi-seed experiment parallelism, which launches one OS
process per seed (reference scripts/reproduce_benchmarks2.sh:89-122).
Here the seed axis is a vmapped leading dimension of the parameter and
optimizer pytrees, so S seeds train simultaneously in one program; on a
device mesh the seed axis shards over 'seed' (quanonet_tpu/parallel).

Dataset semantics: by default all seeds share ONE dataset (generated
with the first seed); seeds differentiate parameter init and batch
shuffling.  This matches the reference in the common case — its
DataManager cache filename carries no seed (reference
data_utils/data_manager.py:108-121), so its per-seed processes all load
the first process's cached dataset.  For wider variance estimates,
``multi_seed_fresh_data=true`` regenerates the dataset per seed
(bypassing the cache) and vmaps the data axis alongside the parameter
axis, which is strictly broader than what the reference measures.

Artifacts: per-seed experiment directories with the standard contract
(metric.json, best_model.ckpt/.npz), exactly as if S separate runs had
executed.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np

from quanonet_tpu import checkpoint as ckpt_io
from quanonet_tpu.config import parse_bool, set_random_seed
from quanonet_tpu.data.manager import DataManager
from quanonet_tpu.logger import ExperimentLogger
from quanonet_tpu.metrics import compute_metrics, rel_l2
from quanonet_tpu.solver import (
    QUANTUM_MODELS, _segment_size, build_model, build_optimizer,
    enable_compilation_cache, make_train_epoch,
)


def _guard_vmapped_engine(config, n_seeds):
    """Never vmap the Pallas chain across seeds: vmap batches the whole
    kernel (state, residuals, all block matrices) into one VMEM-resident
    instance, multiplying the footprint by n_seeds — which OOMs the
    scoped-VMEM stack for the larger nets — and the vmapped kernels
    serialize anyway, so there is no aggregate speedup to lose (measured
    in round 1).  The dense XLA engine vmaps cleanly."""
    if config['model_type'] not in QUANTUM_MODELS or n_seeds <= 1:
        return config
    from quanonet_tpu.ops.hea import resolve_engine

    engine = resolve_engine(config.get('engine', 'auto'),
                            config['num_qubits'])
    if engine not in ('pallas', 'embed'):
        return config
    config = dict(config)
    config['engine'] = 'dense'
    print(f"[multi-seed] vmapping the {engine} chain x{n_seeds} seeds "
          f"multiplies its VMEM footprint; using the dense engine")
    return config


MAX_VMAP_SEEDS_LARGE_N = 1   # NEVER vmap the fused engine across seeds
#                              at Q>=8: vmapped programs crashed the TPU
#                              worker at Q10 (5 seeds, and 2 seeds on a
#                              50-block net) AND at Q8 (5 seeds,
#                              40-block net) — seeds run sequentially.
FUSED_SEQ_MIN_QUBITS = 8


def _needs_sequential_seeds(config, n_seeds):
    if config['model_type'] not in QUANTUM_MODELS:
        return False
    from quanonet_tpu.ops.hea import resolve_engine
    engine = resolve_engine(config.get('engine', 'auto'),
                            config['num_qubits'])
    return (engine in ('fused', 'pfused')
            and config['num_qubits'] >= FUSED_SEQ_MIN_QUBITS
            and n_seeds > MAX_VMAP_SEEDS_LARGE_N)


def _train_seeds_sequential(config, seeds):
    """Reference semantics exactly: one training run per seed (the
    reference launches one OS process per seed).  Used where the vmapped
    program is compiler-hostile (large-n fused engine, see
    MAX_VMAP_SEEDS_LARGE_N)."""
    from quanonet_tpu.solver import Solver
    prefix = config.get('prefix') or "outputs"
    out = {}
    for s in seeds:
        cfg_s = dict(config)
        cfg_s['seed'] = s
        cfg_s.pop('multi_seed', None)
        # Skip completed seeds HERE: Solver.train() handles resume with
        # sys.exit(0) (the reference's per-process semantics), which would
        # terminate the whole loop after the first completed seed and
        # silently skip the rest.  Side-effect-free probe: constructing
        # a logger would drop an empty TB event file per seed.
        if ExperimentLogger.completed(cfg_s, base_output_dir=prefix):
            print(f"⏩ [Resume] Seed {s} already completed; skipping.")
            out[s] = None
            continue
        set_random_seed(s)
        solver = Solver(cfg_s)
        history = solver.train()
        out[s] = solver.evaluate(history)
    return out


def train_multi_seed(config):
    """Train len(config['multi_seed']) seeds as one vmapped program.
    Returns {seed: metrics}."""
    enable_compilation_cache()
    seeds = list(config['multi_seed'])
    n_seeds = len(seeds)
    prefix = config.get('prefix') or "outputs"
    if (config.get('noise_p') is not None or config.get('readout_p')
            or config.get('damp_gamma') or config.get('dephase_p')):
        # noise-aware training threads a 'noise' rng per optimizer step;
        # the vmapped multi-seed epoch doesn't carry per-seed rng streams,
        # so run the reference's per-process semantics instead
        print("[multi-seed] noise-aware training: seeds run sequentially")
        return _train_seeds_sequential(config, seeds)
    if _needs_sequential_seeds(config, n_seeds):
        print(f"[multi-seed] Q{config['num_qubits']} fused engine: "
              f"vmapping {n_seeds} seeds is compiler-hostile; training "
              f"seeds sequentially (reference per-process semantics)")
        return _train_seeds_sequential(config, seeds)

    # per-seed experiment dirs; completed seeds are dropped from the
    # vmapped batch (per-seed resume, matching the reference's
    # per-process skip) instead of retraining and overwriting them.
    # Probe completion side-effect-free first; build loggers only for
    # the seeds that will actually train.
    def _cfg_for(s):
        cfg_s = dict(config)
        cfg_s['seed'] = s
        cfg_s.pop('multi_seed', None)
        return cfg_s

    done_seeds = [s for s in seeds
                  if ExperimentLogger.completed(_cfg_for(s),
                                                base_output_dir=prefix)]
    if len(done_seeds) == len(seeds):
        print("⏩ [Resume] All seeds already completed. Skipping.")
        return {s: None for s in seeds}
    if done_seeds:
        print(f"⏩ [Resume] Seeds {done_seeds} already completed; "
              f"training the rest.")
    seeds = [s for s in seeds if s not in done_seeds]
    n_seeds = len(seeds)
    loggers = {s: ExperimentLogger(_cfg_for(s), base_output_dir=prefix)
               for s in seeds}

    model_type = config['model_type']

    def _split_inputs(data):
        if model_type in ('HEAQNN', 'FNN', 'FNO'):
            return ((data['train_input'].astype(np.float32),),
                    (data['test_input'].astype(np.float32),))
        return ((data['train_branch_input'].astype(np.float32),
                 data['train_trunk_input'].astype(np.float32)),
                (data['test_branch_input'].astype(np.float32),
                 data['test_trunk_input'].astype(np.float32)))

    dm = DataManager(config, data_dir=os.path.join(prefix, "..", "data"))
    fresh_data = parse_bool(config.get('multi_seed_fresh_data', False))
    if fresh_data:
        # Per-seed dataset regeneration: each seed gets its own train/test
        # split and point subsample (the expensive raw GRF/PDE solves stay
        # shared through the raw cache).  The data arrays gain a leading
        # seed axis and are vmapped alongside the parameter axis.
        per_seed_data = []
        for s in seeds:
            set_random_seed(s)
            per_seed_data.append(dm._generate_and_process())
        data = per_seed_data[0]
        tr_list, te_list = zip(*(_split_inputs(d) for d in per_seed_data))
        train_inputs = tuple(np.stack(cols) for cols in zip(*tr_list))
        test_inputs = tuple(np.stack(cols) for cols in zip(*te_list))
        train_output = np.stack(
            [d['train_output'].astype(np.float32) for d in per_seed_data])
        test_output = np.stack(
            [d['test_output'].astype(np.float32) for d in per_seed_data])
        data_ax = 0
    else:
        set_random_seed(seeds[0])
        data = dm.get_data()
        train_inputs, test_inputs = _split_inputs(data)
        train_output = data['train_output'].astype(np.float32)
        test_output = data['test_output'].astype(np.float32)
        data_ax = None

    config = _guard_vmapped_engine(config, n_seeds)
    model, _mode = build_model(config, data)

    num_samples = train_output.shape[1 if fresh_data else 0]
    batch_size = min(config.get('batch_size', 100), num_samples)
    num_batches = max(1, int(np.ceil(num_samples / batch_size)))
    epochs = config['num_epochs']
    per_sample = int(np.prod(train_output.shape[1:]))

    optimizer = build_optimizer(config, epochs * num_batches)
    train_epoch = make_train_epoch(model.apply, optimizer, num_samples,
                                   batch_size, per_sample)

    dummies = tuple(jnp.asarray(a[0, :1] if fresh_data else a[:1])
                    for a in train_inputs)
    init_keys = jnp.stack([jax.random.PRNGKey(s) for s in seeds])
    params = jax.vmap(lambda k: model.init(k, *dummies))(init_keys)
    opt_state = jax.vmap(optimizer.init)(params)

    inputs = tuple(jnp.asarray(a) for a in train_inputs)
    outputs = jnp.asarray(train_output)

    def seed_epoch(carry, key, inputs, outputs):
        # carry: per-seed (params, opt_state); key: per-seed epoch key
        return train_epoch(carry, key, inputs, outputs)

    @jax.jit
    def run_segment(params, opt_state, best_loss, best_params, keys,
                    inputs, outputs):
        # keys: (seg, n_seeds, 2); data shared (broadcast) across seeds
        def epoch_step(carry, key_s):
            params, opt_state, best_loss, best_params = carry
            (params, opt_state), (avg_loss, sse) = jax.vmap(
                seed_epoch, in_axes=((0, 0), 0, data_ax, data_ax))(
                (params, opt_state), key_s, inputs, outputs)
            improved = avg_loss < best_loss                    # (S,)
            best_loss = jnp.where(improved, avg_loss, best_loss)

            def upd(b, p):
                imp = improved.reshape((-1,) + (1,) * (p.ndim - 1))
                return jnp.where(imp, p, b)
            best_params = jax.tree_util.tree_map(upd, best_params, params)
            return (params, opt_state, best_loss, best_params), \
                (avg_loss, sse)
        (params, opt_state, best_loss, best_params), hist = jax.lax.scan(
            epoch_step, (params, opt_state, best_loss, best_params), keys)
        return params, opt_state, best_loss, best_params, hist

    all_keys = jnp.stack([
        jax.random.split(jax.random.PRNGKey(s), epochs) for s in seeds],
        axis=1)  # (epochs, n_seeds, 2)

    seg = _segment_size(epochs)
    best_loss = jnp.full((n_seeds,), np.inf, jnp.float32)
    best_params = params
    histories = {s: {'loss_train': [], 'loss_test': []} for s in seeds}
    if fresh_data:
        out_norms = [float(np.linalg.norm(train_output[i].astype(np.float64)))
                     for i in range(n_seeds)]
    else:
        out_norms = [float(np.linalg.norm(
            train_output.astype(np.float64)))] * n_seeds

    done = 0
    while done < epochs:
        n = min(seg, epochs - done)
        params, opt_state, best_loss, best_params, hist = run_segment(
            params, opt_state, best_loss, best_params,
            all_keys[done:done + n], inputs, outputs)
        avg = np.asarray(hist[0])     # (n, S)
        sse = np.asarray(hist[1])
        for e in range(n):
            for si, s in enumerate(seeds):
                histories[s]['loss_train'].append(float(avg[e, si]))
                loggers[s].log_metric("Loss/train", float(avg[e, si]),
                                      done + e)
                loggers[s].log_metric(
                    "Error/rel_l2",
                    float(np.sqrt(max(sse[e, si], 0.0))
                          / (out_norms[si] + 1e-8)),
                    done + e)
        done += n
        if (done % 10) < seg:
            print(f"Epoch {done - 1} | per-seed MSE: "
                  f"{np.asarray(best_loss).round(6)}")

    # per-seed evaluation + artifacts
    best_params = jax.device_get(best_params)
    metrics_by_seed = {}
    fwd = jax.jit(lambda p, *inp: model.apply(p, *inp))
    for si, s in enumerate(seeds):
        test_in_s = tuple((a[si] if fresh_data else a) for a in test_inputs)
        test_out_s = test_output[si] if fresh_data else test_output
        test_in_dev = tuple(jnp.asarray(a) for a in test_in_s)
        p_s = jax.tree_util.tree_map(lambda a: jnp.asarray(a[si]),
                                     best_params)
        preds = []
        nt = test_out_s.shape[0]
        eval_bs = max(batch_size, 4096)   # eval is forward-only; big chunks
        for st in range(0, nt, eval_bs):
            batch = tuple(a[st:st + eval_bs] for a in test_in_dev)
            preds.append(np.asarray(fwd(p_s, *batch)))
        y_pred = np.concatenate(preds, axis=0)
        m = compute_metrics(test_out_s, y_pred)
        m['rel_l2'] = rel_l2(test_out_s, y_pred)
        metrics_by_seed[s] = m

        if config.get('if_save', True):
            host_p = jax.device_get(p_s)
            if model_type in QUANTUM_MODELS:
                raw = ckpt_io.quantum_params_to_raw(host_p, model_type)
            else:
                raw = ckpt_io.flatten_tree(host_p)
            path = loggers[s].get_ckpt_path()
            ckpt_io.save_ms_ckpt(path, raw)
            np.savez(path.replace('.ckpt', '.npz'), **raw)
        loggers[s].save_metrics(metrics_by_seed[s], histories[s])
        loggers[s].close()
        print(f"Seed {s}: rel_l2={metrics_by_seed[s]['rel_l2']:.4f} "
              f"MSE={metrics_by_seed[s]['MSE']:.6f}")
    for s in done_seeds:
        metrics_by_seed[s] = None   # resumed, left untouched
    return metrics_by_seed
