"""
Unified solver: ONE optax training loop for every model family, replacing
the reference's three framework-specific loops (solvers/solver_ms.py,
solver_pt.py, solver_dde.py — same loop shape, different plumbing).

TPU-first design:
* the entire dataset lives on device; epochs run as ``lax.scan`` over
  minibatches inside a jitted multi-epoch segment — one XLA dispatch per
  ``epochs_per_sync`` epochs instead of one per batch (the reference
  crosses the host boundary per batch, solver_ms.py:228-236, which is
  exactly what the >=50x target forbids, SURVEY.md §7 hard part 4);
* best-model tracking happens on device inside the scan (jnp.where on the
  param pytree); the host only syncs per segment to write checkpoints;
* ragged last batches are handled with a static-shape mask (XLA-friendly)
  reproducing the reference's per-epoch averaging semantics;
* optional data-parallel mesh sharding (quanonet_tpu/parallel).

Contract kept from the reference: resume-skip on metric.json, best+final
dual-format checkpoints (.npz reference schema + MindSpore-compatible
.ckpt), warm start via init_checkpoint, if_train / if_save / ckpt_path
config keys, per-epoch Loss/train + Error/rel_l2 TensorBoard scalars.
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from quanonet_tpu import checkpoint as ckpt_io
from quanonet_tpu.config import parse_bool
from quanonet_tpu.data.manager import DataManager
from quanonet_tpu.logger import ExperimentLogger, StreamToLogger, setup_logger
from quanonet_tpu.metrics import compute_metrics, count_parameters, rel_l2
from quanonet_tpu.models import (
    FNN, FNO, DeepONet, HEAQNN, QuanONet, deeponet_layer_sizes,
)

QUANTUM_MODELS = ('QuanONet', 'HEAQNN')


def enable_compilation_cache(path=None):
    """Persistent XLA compilation cache.  On the tunneled TPU backend the
    first execution of a program pays a ~200s one-time server-side cost;
    the cache cuts repeat runs to seconds."""
    if path is None:
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), '.jax_cache')
    try:
        jax.config.update('jax_compilation_cache_dir', path)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:  # pragma: no cover - older jax
        pass


def _segment_size(epochs, cap=64):
    """Segment length for the multi-epoch jitted loop, minimizing compiled
    program shapes (recompiles are expensive on the TPU tunnel).

    Prefers the largest divisor of ``epochs`` <= cap (exactly ONE program
    shape).  When the best divisor is tiny (e.g. prime ``epochs``: the
    only divisor <= 64 of 997 is 1, which would dispatch 997 programs over
    a ~5 ms-RPC tunnel), fall back to ``cap`` with a ragged tail — TWO
    program shapes, ~epochs/cap dispatches."""
    hi = min(cap, epochs)
    for s in range(hi, 0, -1):
        if epochs % s == 0:
            if s >= (hi + 1) // 2:
                return s
            break
    return hi


def save_train_state(path, done, params, opt_state, best_loss, best_params,
                     loss_hist):
    """Atomic elastic-resume snapshot at a segment boundary.

    Leaves are stored by flatten order; the tree STRUCTURES are not
    serialized — they are rebuilt at load time from a fresh
    ``model.init`` / ``optimizer.init`` (same config => same structure),
    so the file format is plain .npz with no pickling.
    """
    arrs = {'done': np.asarray(done, np.int64),
            'best_loss': np.asarray(best_loss, np.float32),
            'loss_hist': np.asarray(loss_hist, np.float32)}
    for tag, tree in (('p', params), ('o', opt_state), ('b', best_params)):
        for i, leaf in enumerate(jax.tree_util.tree_leaves(tree)):
            arrs[f'{tag}{i}'] = np.asarray(leaf)
    tmp = path + '.tmp.npz'
    np.savez(tmp, **arrs)
    os.replace(tmp, path)


def load_train_state(path, params_like, opt_state_like):
    """Inverse of :func:`save_train_state`.  ``*_like`` supply the pytree
    structures (from fresh init on the identical config)."""
    z = np.load(path)

    def fill(tag, like):
        treedef = jax.tree_util.tree_structure(like)
        leaves = [jnp.asarray(z[f'{tag}{i}'])
                  for i in range(treedef.num_leaves)]
        return jax.tree_util.tree_unflatten(treedef, leaves)

    return (int(z['done']), fill('p', params_like),
            fill('o', opt_state_like), jnp.asarray(z['best_loss']),
            fill('b', params_like), [float(x) for x in z['loss_hist']])


def build_model(config, data):
    """Model factory (reference solver_ms.py:91-147 + solver_dde.py:108-212
    net-size policies).  Returns (flax module, input mode) where mode is
    'tuple' (branch, trunk) or 'single' (one array)."""
    model_type = config['model_type']
    net_size = config.get('net_size')
    if_tf = parse_bool(config.get('if_trainable_freq', 'true'))
    scale = config.get('scale_coeff', 0.01)
    ham_bound = tuple(config.get('ham_bound') or (-5.0, 5.0))
    ham_diag = config.get('ham_diag')
    ham_diag = tuple(ham_diag) if ham_diag is not None else None
    ham_pauli = config.get('ham_pauli', 'Z')
    engine = config.get('engine', 'auto')
    # Noise-aware training (ops/noise.py): the forward becomes the
    # trajectory-averaged noisy expectation; 8 trajectories default in
    # training (the gradient averages over them AND the batch, so few are
    # needed) vs 32 at inference
    noise_kw = {}
    from quanonet_tpu.ops.noise import is_noisy
    if is_noisy(config.get('noise_p'), config.get('readout_p'),
                config.get('damp_gamma'), config.get('dephase_p')):
        noise_kw = dict(
            noise_p=(float(config['noise_p'])
                     if config.get('noise_p') is not None else None),
            noise_traj=int(config.get('noise_traj') or 8),
            readout_p=float(config.get('readout_p') or 0.0),
            damp_gamma=(float(config['damp_gamma'])
                        if config.get('damp_gamma') else None),
            dephase_p=(float(config['dephase_p'])
                       if config.get('dephase_p') else None))

    # QPU-trainable gradients (ops/param_shift.py): shift-rule VJP and/or
    # finite-shot sampled expectations in the training loss
    gm = str(config.get('grad_method') or 'autodiff')
    train_shots = config.get('train_shots')
    if train_shots and gm == 'autodiff':
        raise ValueError("--train_shots needs --grad_method shift or spsa "
                         "(autodiff cannot differentiate sampling)")
    if gm == 'shift':
        noise_kw['grad_method'] = 'shift'
        if config.get('ps_chunk'):
            noise_kw['ps_chunk'] = int(config['ps_chunk'])
    if train_shots:
        noise_kw['shots'] = int(train_shots)
    if (gm != 'autodiff' or train_shots) and model_type not in (
            'QuanONet', 'HEAQNN'):
        raise ValueError(f"--grad_method/--train_shots apply to quantum "
                         f"models only, not {model_type}")

    if model_type == 'QuanONet':
        ns = tuple(net_size or (20, 2, 10, 2))
        branch_in = data['train_branch_input'].shape[1]
        trunk_in = data['train_trunk_input'].shape[1]
        model = QuanONet(num_qubits=config['num_qubits'],
                         branch_input_size=branch_in, trunk_input_size=trunk_in,
                         net_size=ns, scale_coeff=scale,
                         if_trainable_freq=if_tf, ham_bound=ham_bound,
                         ham_diag=ham_diag, ham_pauli=ham_pauli, engine=engine,
                         **noise_kw)
        return model, 'tuple'
    if model_type == 'HEAQNN':
        ns = tuple(net_size or (20, 2))
        input_size = data['train_input'].shape[1]
        model = HEAQNN(num_qubits=config['num_qubits'], input_size=input_size,
                       net_size=ns, scale_coeff=scale, if_trainable_freq=if_tf,
                       ham_bound=ham_bound, ham_diag=ham_diag,
                       ham_pauli=ham_pauli, engine=engine, **noise_kw)
        return model, 'single'
    if noise_kw:
        raise ValueError(f"--noise_p/--readout_p/--damp_gamma/--dephase_p "
                         f"apply to quantum models only, not {model_type}")
    if model_type == 'DeepONet':
        branch_in = data['train_branch_input'].shape[1]
        trunk_in = data['train_trunk_input'].shape[1]
        bl, tl = deeponet_layer_sizes(net_size, branch_in, trunk_in)
        return DeepONet(branch_layers=bl, trunk_layers=tl), 'tuple'
    if model_type == 'FNN':
        ns = tuple(net_size or (3, 20))
        return FNN(net_size=ns), 'single'
    if model_type == 'FNO':
        cfg = list(net_size or [])
        modes = int(cfg[0]) if len(cfg) > 0 else 15
        width = int(cfg[1]) if len(cfg) > 1 else 14
        depth = int(cfg[2]) if len(cfg) > 2 else 3
        fc_hidden = int(cfg[3]) if len(cfg) > 3 else 32
        return FNO(modes=modes, width=width, layers=depth,
                   fc_hidden=fc_hidden), 'single'
    raise ValueError(f"Unknown model type: {model_type}")


def _decay_tuple_schedule(lr, decay, total_steps):
    """DeepXDE-style ``decay`` tuple vocabulary (reference
    solvers/solver_dde.py:214-271 maps lr_scheduler names onto these
    tuples for Model.compile; DeepXDE consumes the forms below):

    ('step', decay_steps, gamma)          lr · γ^⌊t/steps⌋
    ('exponential', decay_steps, gamma)   lr · γ^(t/steps)   (smooth)
    ('inverse time', decay_steps, gamma)  lr / (1 + γ·t/steps)
    ('cosine', T_max, alpha)              cosine from lr to α·lr over T_max
    """
    name = str(decay[0]).lower().replace('_', ' ')
    if name == 'step':
        steps, gamma = int(decay[1]), float(decay[2])
        return lambda t: lr * gamma ** (t // steps)
    if name == 'exponential':
        steps, gamma = float(decay[1]), float(decay[2])
        return lambda t: lr * gamma ** (t / steps)
    if name == 'inverse time':
        steps, gamma = float(decay[1]), float(decay[2])
        return lambda t: lr / (1.0 + gamma * t / steps)
    if name == 'cosine':
        t_max = float(decay[1]) if len(decay) > 1 else float(total_steps)
        alpha = float(decay[2]) if len(decay) > 2 else 0.0
        floor = alpha * lr
        return lambda t: (floor + 0.5 * (lr - floor)
                          * (1 + jnp.cos(jnp.pi
                                         * jnp.minimum(t, t_max) / t_max)))
    raise ValueError(
        f"unknown decay form '{decay[0]}' (expected one of step/"
        f"exponential/'inverse time'/cosine, solver_dde.py:239-245)")


def build_optimizer(config, total_steps):
    """optax optimizer + LR schedule (reference solver_ms.py:150-180;
    ``decay`` tuple vocabulary from solver_dde.py:214-271)."""
    opt_name = str(config.get('optimizer', 'adam')).lower()
    lr = config['learning_rate']
    opt_kw = config.get('optimizer_kwargs', {}) or {}
    sched = str(config.get('lr_scheduler', 'none')).lower()
    sched_kw = config.get('lr_scheduler_kwargs', {}) or {}
    decay = config.get('decay')

    if decay:
        schedule = _decay_tuple_schedule(lr, decay, total_steps)
    elif sched in ('inverse time', 'inverse_time'):
        steps = sched_kw.get('decay_steps', sched_kw.get('step_size', 1000))
        gamma = sched_kw.get('gamma', 0.9)
        schedule = _decay_tuple_schedule(
            lr, ('inverse time', steps, gamma), total_steps)
    elif sched == 'cosine':
        eta_min = sched_kw.get('eta_min', 0.0)
        schedule = lambda t: (eta_min + 0.5 * (lr - eta_min)
                              * (1 + jnp.cos(jnp.pi * t / total_steps)))
    elif sched == 'exponential':
        gamma = sched_kw.get('gamma', 0.99)
        schedule = optax.exponential_decay(lr, 1, gamma)
    elif sched == 'step':
        step_size = sched_kw.get('step_size', 100)
        gamma = sched_kw.get('gamma', 0.5)
        schedule = lambda t: lr * gamma ** (t // step_size)
    else:
        schedule = lr

    opt_map = {
        'adam': optax.adam,
        'adamw': optax.adamw,
        'sgd': optax.sgd,
        'rmsprop': optax.rmsprop,
    }
    opt_cls = opt_map.get(opt_name, optax.adam)
    return opt_cls(schedule, **opt_kw)


def make_train_epoch(model_apply, optimizer, num_samples, batch_size,
                     per_sample, noise_rng=False, rng_collection=None,
                     spsa_c=None):
    """One training epoch as a pure function:
    ((params, opt_state), key, inputs, outputs) -> ((params, opt_state),
    (avg_loss, sse)).  Static-shape masked ragged batches reproduce the
    reference's per-epoch averaging (solver_ms.py:219-245); also the unit
    that multi-seed training vmaps over (quanonet_tpu/multiseed.py).

    noise_rng=True: the model is stochastic (noise-aware training,
    ops/noise.py) — every optimizer step gets a fresh 'noise' rng derived
    from the epoch key, so each step resamples its Pauli trajectories
    (stochastic-gradient semantics over the channel, like dropout).  The
    default path is byte-identical to before the flag existed: the epoch
    key is used directly for the shuffle.

    rng_collection: thread per-step rngs under this flax collection name
    instead of 'noise' (e.g. 'shots' for finite-shot training through the
    shift-rule VJP, ops/param_shift.py).  spsa_c: replace value_and_grad
    with the 2-evaluation SPSA estimator at this perturbation size (the
    step rng drives the Rademacher draw; with a collection set, the model
    rng is derived from the same step rng)."""
    num_batches = max(1, int(np.ceil(num_samples / batch_size)))
    padded = num_batches * batch_size
    collection = 'noise' if noise_rng else rng_collection
    stochastic = bool(collection) or spsa_c is not None

    def batch_loss(p, batch_in, batch_out, mask, rng):
        if rng is None:
            pred = model_apply(p, *batch_in)
        else:
            pred = model_apply(p, *batch_in, rngs={collection: rng})
        m = mask.reshape(mask.shape + (1,) * (pred.ndim - 1))
        sq = (pred - batch_out) ** 2 * m
        return jnp.sum(sq) / jnp.maximum(jnp.sum(mask) * per_sample, 1.0)

    def train_epoch(carry, key, inputs, outputs):
        params, opt_state = carry
        if stochastic:
            key, knoise = jax.random.split(key)
            step_rngs = jax.random.split(knoise, num_batches)
        perm = jax.random.permutation(key, num_samples)
        pad_idx = jnp.concatenate(
            [perm, perm[:padded - num_samples]])  # wrap, masked out below
        mask_flat = (jnp.arange(padded) < num_samples).astype(jnp.float32)
        idx = pad_idx.reshape(num_batches, batch_size)
        masks = mask_flat.reshape(num_batches, batch_size)
        xs = (idx, masks, step_rngs) if stochastic else (idx, masks)

        def step(carry, b):
            params, opt_state = carry
            if stochastic:
                bi, bm, rng = b
            else:
                (bi, bm), rng = b, None
            batch_in = tuple(a[bi] for a in inputs)
            batch_out = outputs[bi]
            if spsa_c is not None:
                from quanonet_tpu.ops.param_shift import spsa_gradient
                model_rng = (jax.random.fold_in(rng, 1)
                             if collection else None)
                grads, loss = spsa_gradient(
                    lambda p: batch_loss(p, batch_in, batch_out, bm,
                                         model_rng),
                    params, jax.random.fold_in(rng, 0), c=spsa_c)
            else:
                loss, grads = jax.value_and_grad(batch_loss)(
                    params, batch_in, batch_out, bm, rng)
            if hasattr(optimizer, 'fused_step'):
                # one-kernel Adam (ops/pallas_adam.py) — same update
                # rule, ~20 tiny XLA ops fewer per step
                params, opt_state = optimizer.fused_step(
                    grads, opt_state, params)
            else:
                updates, opt_state = optimizer.update(grads, opt_state,
                                                      params)
                params = optax.apply_updates(params, updates)
            return (params, opt_state), (loss, jnp.sum(bm))

        (params, opt_state), (losses, counts) = jax.lax.scan(
            step, (params, opt_state), xs)
        avg_loss = jnp.mean(losses)
        # running rel-L2 from accumulated SSE (solver_ms.py:240-245)
        sse = jnp.sum(losses * counts * per_sample)
        return (params, opt_state), (avg_loss, sse)

    return train_epoch


def make_run_segment(train_epoch):
    """Jit a multi-epoch segment with on-device best-param tracking.
    Data arrive as jit ARGUMENTS: closed-over device arrays would be
    lowered as giant MLIR constants (fails on the TPU tunnel)."""
    @jax.jit
    def run_segment(params, opt_state, best_loss, best_params, keys,
                    inputs, outputs):
        def epoch_step(carry, key):
            params, opt_state, best_loss, best_params = carry
            (params, opt_state), (avg_loss, sse) = train_epoch(
                (params, opt_state), key, inputs, outputs)
            improved = avg_loss < best_loss
            best_loss = jnp.where(improved, avg_loss, best_loss)
            best_params = jax.tree_util.tree_map(
                lambda b, p: jnp.where(improved, p, b),
                best_params, params)
            return (params, opt_state, best_loss, best_params), \
                (avg_loss, sse)
        (params, opt_state, best_loss, best_params), hist = jax.lax.scan(
            epoch_step, (params, opt_state, best_loss, best_params), keys)
        return params, opt_state, best_loss, best_params, hist
    return run_segment


class Solver:
    """__init__(config) / train() -> history / evaluate(history) -> metrics
    (uniform interface, reference main.py:114-115)."""

    def __init__(self, config, input_sampler=None):
        enable_compilation_cache()
        self.config = config
        self.operator_type = config['operator']
        self.model_type = config['model_type']

        prefix = config.get('prefix') or "outputs"
        self.exp_logger = ExperimentLogger(config, base_output_dir=prefix)
        self.run_id = self.exp_logger.exp_name
        self.config['run_id'] = self.run_id

        self.logger = setup_logger(self.exp_logger.text_log_path)
        sys.stdout = StreamToLogger(self.logger)
        self.logger.info(f"Initialized Solver (JAX/TPU) for {self.model_type}")
        self.logger.info(f"Devices: {jax.devices()}")

        self.dm = DataManager(config,
                              data_dir=os.path.join(prefix, "..", "data"),
                              logger=self.logger,
                              input_sampler=input_sampler)
        self.data = self.dm.get_data()
        self._route_data()

        self.shard_mode = self._setup_sharding()
        self.model, self.input_mode = build_model(config, self.data)
        self.params = self._init_params()
        self.logger.info(
            f"Model Parameters: {count_parameters(self.params)}")
        self.best_loss = float('inf')
        self.best_params = None
        self.best_model_path = None

    # ── sharded training (--shard {data,amp,pipe}) ──────────────────────────
    def _setup_sharding(self):
        """Route the quantum engine through a mesh-sharded program.

        'data'  — alias for the DP path (equivalent to --num_devices N);
        'amp'   — amplitude sharding: the 2^n state axis splits across
                  devices (parallel/amplitude.py), training Q12+ models
                  whose statevectors outgrow one chip;
        'pipe'  — pipeline parallelism over the block chain
                  (parallel/pipeline.py, GPipe schedule).

        amp/pipe install a process-wide shard context and set the model
        engine so EVERY expectation — train loss, eval, init — runs the
        shard_map'd program.  New capability (the reference has no
        distributed execution, SURVEY.md §5.7/5.8)."""
        config = self.config
        mode = str(config.get('shard') or 'none').lower()
        if mode in ('none', 'data'):
            if mode == 'data' and int(config.get('num_devices') or 0) <= 1:
                config['num_devices'] = len(jax.devices())
            return mode
        if mode not in ('amp', 'pipe'):
            raise ValueError(f"--shard must be one of none/data/amp/pipe, "
                             f"got '{mode}'")
        if self.model_type not in QUANTUM_MODELS:
            raise ValueError(f"--shard {mode} shards the quantum state/"
                             f"circuit; {self.model_type} has neither "
                             f"(use --shard data)")
        for k in ('noise_p', 'readout_p', 'damp_gamma', 'dephase_p',
                  'train_shots', 'multi_seed', 'ps_chunk', 'spsa_c'):
            if config.get(k):
                raise ValueError(f"--shard {mode} is incompatible with "
                                 f"--{k} for now")
        if str(config.get('grad_method') or 'autodiff') != 'autodiff':
            raise ValueError(f"--shard {mode} trains by autodiff through "
                             f"the collectives; drop --grad_method")

        from quanonet_tpu.ops.hea import heaqnn_spec, quanonet_spec
        if self.model_type == 'QuanONet':
            ns = tuple(config.get('net_size') or (20, 2, 10, 2))
            spec = quanonet_spec(config['num_qubits'], ns)
        else:
            ns = tuple(config.get('net_size') or (20, 2))
            spec = heaqnn_spec(config['num_qubits'], ns)

        devs = jax.devices()
        n_devices = int(config.get('num_devices') or len(devs))
        if n_devices > len(devs):
            raise ValueError(f"--num_devices {n_devices} > available "
                             f"devices {len(devs)}")
        from quanonet_tpu.parallel.shard_engine import (
            set_shard_context, validate_shard_config,
        )
        validate_shard_config(mode, n_devices, spec,
                              batch_size=int(config.get('batch_size', 100)),
                              n_microbatches=config.get('n_microbatches'))
        from jax.experimental import mesh_utils
        from jax.sharding import Mesh
        mesh = Mesh(mesh_utils.create_device_mesh(
            (n_devices,), devices=devs[:n_devices]), (mode,))
        set_shard_context(mesh, mode,
                          n_microbatches=config.get('n_microbatches'))
        self.shard_mesh = mesh
        config['engine'] = mode
        self.logger.info(
            f"Sharded training: --shard {mode} over {n_devices} devices "
            f"(Q{spec.n_qubits}, {spec.n_blocks} blocks)")
        return mode

    def _replicate_on_shard_mesh(self, tree):
        """Commit a pytree replicated over the amp/pipe mesh so every
        program sees mesh-consistent input placements."""
        from jax.sharding import NamedSharding, PartitionSpec
        sh = NamedSharding(self.shard_mesh, PartitionSpec())
        return jax.tree_util.tree_map(
            lambda a: jax.device_put(jnp.asarray(a), sh), tree)

    # ── data routing (reference solver_ms.py:72-89) ─────────────────────────
    def _route_data(self):
        d = self.data
        if self.model_type in ('HEAQNN', 'FNN', 'FNO'):
            self.train_inputs = (d['train_input'].astype(np.float32),)
            self.test_inputs = (d['test_input'].astype(np.float32),)
        else:
            self.train_inputs = (d['train_branch_input'].astype(np.float32),
                                 d['train_trunk_input'].astype(np.float32))
            self.test_inputs = (d['test_branch_input'].astype(np.float32),
                                d['test_trunk_input'].astype(np.float32))
        self.train_output = d['train_output'].astype(np.float32)
        self.test_output = d['test_output'].astype(np.float32)

    @property
    def _noisy(self):
        """Model forward is stochastic (noise-aware training, ops/noise.py)
        and needs a 'noise' rng on every apply."""
        from quanonet_tpu.ops.noise import is_noisy
        return is_noisy(getattr(self.model, 'noise_p', None),
                        getattr(self.model, 'readout_p', None),
                        getattr(self.model, 'damp_gamma', None),
                        getattr(self.model, 'dephase_p', None))

    @property
    def _rng_collection(self):
        """Flax rng collection the model draws per apply, or None.
        'noise' for noise-aware training; 'shots' for finite-shot
        training (--train_shots, sampled readout in the loss)."""
        if self._noisy:
            return 'noise'
        if getattr(self.model, 'shots', None):
            return 'shots'
        return None

    def _init_params(self):
        key = jax.random.PRNGKey(self.config.get('seed', 0))
        dummies = tuple(jnp.asarray(a[:1]) for a in self.train_inputs)
        col = self._rng_collection
        if col:
            return self.model.init(
                {'params': key, col: jax.random.fold_in(key, 1)},
                *dummies)
        return self.model.init(key, *dummies)

    def _apply(self, params, *inputs):
        col = self._rng_collection
        if col:
            return self.model.apply(
                params, *inputs,
                rngs={col: jax.random.PRNGKey(
                    self.config.get('seed', 0) or 0)})
        return self.model.apply(params, *inputs)

    # ── training ─────────────────────────────────────────────────────────────
    def train(self):
        if self.exp_logger.is_completed():
            print("⏩ [Resume] Experiment already completed "
                  "(metric.json found). Skipping training.")
            sys.exit(0)

        self.logger.info("Starting Training...")
        config = self.config
        epochs = config['num_epochs']
        num_samples = self.train_output.shape[0]

        batch_size = config.get('batch_size', 100)
        if num_samples < batch_size:
            self.logger.warning(
                f"⚠️ Batch size {batch_size} > total samples {num_samples}. "
                f"Reducing to {num_samples}.")
            config['batch_size'] = batch_size = num_samples
        num_batches = max(1, int(np.ceil(num_samples / batch_size)))
        padded = num_batches * batch_size

        optimizer = build_optimizer(config, epochs * num_batches)
        history = {'loss_train': [], 'loss_test': []}

        if config.get('init_checkpoint'):
            self._load_into_params(config['init_checkpoint'])
            self.logger.info(
                f"Loaded init checkpoint: {config['init_checkpoint']}")

        if not parse_bool(config.get('if_train', 'true')):
            self.logger.info("Skipping training (if_train=false)")
            return history

        params = self.params
        opt_state = optimizer.init(params)
        out_norm_sq = float(np.sum(self.train_output.astype(np.float64) ** 2))
        per_sample = int(np.prod(self.train_output.shape[1:]))

        gm = str(config.get('grad_method') or 'autodiff')
        spsa_c = (float(config.get('spsa_c') or 0.05)
                  if gm == 'spsa' else None)
        n_devices = int(config.get('num_devices') or 1)
        if n_devices > 1 and self.shard_mode in ('none', 'data'):
            if gm != 'autodiff' or (self._rng_collection
                                    and not self._noisy):
                raise ValueError(
                    "--grad_method shift/spsa and --train_shots are "
                    "single-device for now; drop --num_devices")
            # SPMD data parallelism over a 'data' mesh axis: training-set
            # shards per device, psum'd global loss/grads.  Noise-aware
            # training composes: each device resamples its own per-step
            # trajectories (rng_collection='noise' below), grads psum'd —
            # same stochastic-gradient semantics as the single-device
            # noisy path, distributed over the fleet
            from quanonet_tpu.parallel import make_mesh
            from quanonet_tpu.parallel.dp_solver import make_dp_run_segment
            mesh = make_mesh(n_devices)
            run_segment, shard_data = make_dp_run_segment(
                self.model.apply, optimizer, mesh, num_samples, batch_size,
                per_sample,
                rng_collection='noise' if self._noisy else None)
            inputs, outputs = shard_data(self.train_inputs,
                                         self.train_output)
            self.logger.info(
                f"Data-parallel training over {n_devices} devices"
                + (" (noise-aware: per-device trajectory resampling)"
                   if self._noisy else ""))

            # Elastic-resume placement contract: restored host arrays must
            # be committed REPLICATED on the mesh, exactly like the
            # previous segment's outputs — otherwise XLA compiles a
            # second program variant for the host-placed inputs whose
            # reduction order (and hence training trajectory) differs.
            from jax.sharding import NamedSharding, PartitionSpec

            def _commit_restored(tree):
                sh = NamedSharding(mesh, PartitionSpec())
                return jax.tree_util.tree_map(
                    lambda x: jax.device_put(x, sh), tree)
        else:
            inputs = tuple(jnp.asarray(a) for a in self.train_inputs)
            outputs = jnp.asarray(self.train_output)
            train_epoch = make_train_epoch(
                self.model.apply, optimizer, num_samples, batch_size,
                per_sample, noise_rng=self._noisy,
                rng_collection=(None if self._noisy
                                else self._rng_collection),
                spsa_c=spsa_c)
            run_segment = make_run_segment(train_epoch)
            _commit_restored = None
            if self.shard_mode in ('amp', 'pipe'):
                # the loop itself is single-program; the shard_map inside
                # the model's expectation spans the mesh.  Commit data and
                # state replicated so every input placement is
                # mesh-consistent (one compiled program variant).
                inputs = self._replicate_on_shard_mesh(inputs)
                outputs = self._replicate_on_shard_mesh(outputs)
                params = self._replicate_on_shard_mesh(params)
                opt_state = self._replicate_on_shard_mesh(opt_state)
                _commit_restored = self._replicate_on_shard_mesh
                self.logger.info(
                    f"--shard {self.shard_mode}: training over "
                    f"{self.shard_mesh.shape[self.shard_mode]}-device mesh")

        seed = config.get('seed', 0)
        base_key = jax.random.PRNGKey(seed if seed is not None else 0)
        all_keys = jax.random.split(base_key, epochs)

        seg = int(config.get('epochs_per_sync')
                  or _segment_size(epochs))
        best_loss_dev = jnp.asarray(np.inf, jnp.float32)
        best_params = params
        if_save = config.get('if_save', True)
        profile_dir = config.get('profile')
        done = 0

        # Elastic mid-run resume (--save_state): snapshot
        # (epoch, params, opt_state, best) at every segment boundary; a
        # killed run restarted with the identical config continues from
        # the last boundary BIT-IDENTICALLY (the per-epoch key protocol
        # is position-indexed, all_keys[done:], so the surviving epochs
        # replay the exact same program+keys).  The reference can only
        # skip fully-completed experiments (solver_ms.py resume-skip).
        save_state = parse_bool(config.get('save_state', 'false'))
        state_path = os.path.join(self.exp_logger.exp_dir, 'train_state.npz')
        if save_state and os.path.exists(state_path):
            (done, params, opt_state, best_loss_dev, best_params,
             history['loss_train']) = load_train_state(
                state_path, params, opt_state)
            if _commit_restored is not None:
                params, opt_state, best_loss_dev, best_params = \
                    _commit_restored(
                        (params, opt_state, best_loss_dev, best_params))
            self.logger.info(
                f"[Elastic resume] restored train state at epoch {done} "
                f"from {state_path}")
        start_done = done

        t0 = time.time()
        while done < epochs:
            n = min(seg, epochs - done)
            is_profile_seg = (done == seg) or (seg >= epochs and done == 0)
            if profile_dir and is_profile_seg:
                # profile the second segment (the first includes compile),
                # or the only segment when there is just one
                with jax.profiler.trace(profile_dir):
                    params, opt_state, best_loss_dev, best_params, hist = \
                        run_segment(params, opt_state, best_loss_dev,
                                    best_params, all_keys[done:done + n],
                                    inputs, outputs)
                    jax.block_until_ready(params)
                self.logger.info(f"Profiler trace written to {profile_dir}")
            else:
                params, opt_state, best_loss_dev, best_params, hist = \
                    run_segment(params, opt_state, best_loss_dev,
                                best_params, all_keys[done:done + n],
                                inputs, outputs)
            avg_losses = np.asarray(hist[0])
            sses = np.asarray(hist[1])
            for e in range(n):
                epoch = done + e
                avg_loss = float(avg_losses[e])
                rel_err = float(np.sqrt(max(sses[e], 0.0))
                                / (np.sqrt(out_norm_sq) + 1e-8))
                history['loss_train'].append(avg_loss)
                self.exp_logger.log_metric("Loss/train", avg_loss, epoch)
                self.exp_logger.log_metric("Error/rel_l2", rel_err, epoch)
                if epoch % 10 == 0:
                    print(f"Epoch {epoch} | MSE: {avg_loss:.6e} | "
                          f"Rel_L2: {rel_err:.4%}")
            done += n
            new_best = float(best_loss_dev)
            if new_best < self.best_loss:
                self.best_loss = new_best
                self.best_params = jax.device_get(best_params)
                if if_save:
                    self.best_model_path = self.exp_logger.get_ckpt_path()
                    self._save_checkpoint(self.best_params,
                                          self.best_model_path)
            if save_state and done < epochs:
                save_train_state(state_path, done, jax.device_get(params),
                                 jax.device_get(opt_state),
                                 float(best_loss_dev),
                                 jax.device_get(best_params),
                                 history['loss_train'])

        if save_state and os.path.exists(state_path):
            os.remove(state_path)           # run completed; snapshot obsolete
        wall = time.time() - t0
        sps = (epochs - start_done) * num_samples / max(wall, 1e-9)
        self.logger.info(
            f"Training wall-time: {wall:.2f}s "
            f"({sps:,.0f} samples/sec incl. compile)")
        self.train_samples_per_sec = sps

        self.params = jax.device_get(params)
        if self.best_params is None:
            self.best_params = self.params
        if if_save:
            final_path = self.exp_logger.get_ckpt_path(is_final=True)
            self._save_checkpoint(self.params, final_path)
            self.logger.info(f"Saved FINAL model to {final_path}")
        return history

    # ── checkpointing ─────────────────────────────────────────────────────────
    def _save_checkpoint(self, params, ckpt_path):
        """Dual-format save (.ckpt MindSpore-compatible + .npz reference
        schema), mirroring solver_ms.py:256-263."""
        if self.model_type in QUANTUM_MODELS:
            raw = ckpt_io.quantum_params_to_raw(params, self.model_type)
        else:
            raw = ckpt_io.flatten_tree(params)
        ckpt_io.save_ms_ckpt(ckpt_path, raw)
        npz_path = ckpt_path.replace('.ckpt', '.npz')
        tmp = npz_path + '.tmp.npz'
        np.savez(tmp, **raw)
        os.replace(tmp, npz_path)

    def _load_into_params(self, path):
        raw = ckpt_io.load_raw(path)
        if self.model_type in QUANTUM_MODELS:
            net_size = tuple(self.config.get('net_size') or (20, 2, 10, 2))
            if_tf = parse_bool(self.config.get('if_trainable_freq', 'true'))
            tree = ckpt_io.quantum_params_from_raw(
                raw, self.model_type, net_size, self.config['num_qubits'],
                if_tf)
        else:
            tree = ckpt_io.unflatten_tree(raw)
        self.params = jax.tree_util.tree_map(jnp.asarray, tree)

    # ── evaluation (reference solver_ms.py:279-330) ──────────────────────────
    def evaluate(self, history=None):
        self.logger.info("Evaluating...")
        params = None
        if self.best_params is not None:
            params = self.best_params
            self.logger.info("Using best-epoch parameters")
        elif self.config.get('ckpt_path') and \
                os.path.exists(self.config['ckpt_path']):
            self._load_into_params(self.config['ckpt_path'])
            params = self.params
            self.logger.info(
                f"Loaded evaluation model from {self.config['ckpt_path']}")
        else:
            params = self.params

        params = jax.tree_util.tree_map(jnp.asarray, params)
        # eval is a pure forward pass; use large chunks (small chunks mean
        # thousands of dispatches over the TPU tunnel)
        batch_size = max(self.config.get('batch_size', 100), 4096)
        n = self.test_output.shape[0]
        col = self._rng_collection
        if col:
            # evaluate under the SAME channel/readout the model was
            # trained against (replayable: keyed off the run seed per
            # chunk)
            ekey = jax.random.PRNGKey(self.config.get('seed', 0) or 0)
            fwd = jax.jit(lambda k, *inp: self.model.apply(
                params, *inp, rngs={col: k}))
        else:
            fwd = jax.jit(lambda *inp: self.model.apply(params, *inp))

        # when training ran data-parallel, evaluate over the same mesh:
        # shard the sample axis over 'data' (params replicated) and let
        # XLA run the forward SPMD.  amp/pipe modes shard INSIDE the
        # forward instead — batches go in replicated.
        n_devices = int(self.config.get('num_devices') or 1)
        shard_mode = getattr(self, 'shard_mode', 'none')
        shard = None
        if shard_mode in ('amp', 'pipe'):
            from jax.sharding import NamedSharding, PartitionSpec
            shard = NamedSharding(self.shard_mesh, PartitionSpec())
            n_devices = 1   # replicate, don't pad/shard the sample axis
        elif n_devices > 1:
            from jax.sharding import NamedSharding, PartitionSpec
            from quanonet_tpu.parallel import make_mesh
            mesh = make_mesh(n_devices)
            shard = NamedSharding(mesh, PartitionSpec('data'))

        preds = []
        for s in range(0, n, batch_size):
            batch = tuple(a[s:s + batch_size] for a in self.test_inputs)
            real = batch[0].shape[0]
            if shard is not None:
                pad = (-real) % n_devices
                if pad:
                    batch = tuple(np.concatenate([b, b[:pad]])
                                  for b in batch)
                batch = tuple(jax.device_put(jnp.asarray(b), shard)
                              for b in batch)
            else:
                batch = tuple(jnp.asarray(b) for b in batch)
            if col:
                preds.append(np.asarray(
                    fwd(jax.random.fold_in(ekey, s), *batch))[:real])
            else:
                preds.append(np.asarray(fwd(*batch))[:real])
        y_pred = np.concatenate(preds, axis=0)
        y_true = self.test_output

        rel_error = rel_l2(y_true, y_pred)
        self.logger.info(
            f"⚡ Test Relative L2 Error: {rel_error:.6f} ({rel_error:.2%})")
        metrics = compute_metrics(y_true, y_pred)
        metrics['rel_l2'] = rel_error
        if hasattr(self, 'train_samples_per_sec'):
            metrics['train_samples_per_sec'] = self.train_samples_per_sec
        self.logger.info(f"Metrics: {metrics}")
        self.exp_logger.save_metrics(metrics, history)
        self.exp_logger.close()
        return metrics
