"""
Standalone inference for QuanONet / HEAQNN / DeepONet / FNN / FNO.

API and CLI mirror the reference's infer.py (reference infer.py:1-427):
hyper-parameters are auto-parsed from the experiment-ID directory naming
convention (the round-trip contract with logger.get_experiment_id), with
keyword/CLI overrides.  Loads both checkpoint formats (.npz and MindSpore
.ckpt) without MindSpore, plus this framework's own classical-model
checkpoints.

The reference's `cfg_for_dims` NameError on the quantum auto-data path
(reference infer.py:362 — documented bug, SURVEY.md §2b) is fixed here:
the parsed config is resolved before the data branch needs it.
"""
import argparse
import os
import re

import numpy as np

from quanonet_tpu import checkpoint as ckpt_io
from quanonet_tpu.metrics import compute_metrics, rel_l2

_NET_RE = re.compile(r'Net(\d+)-(\d+)-(\d+)-(\d+)')
_NET2_RE = re.compile(r'Net(\d+)-(\d+)(?:[^-]|$)')
_Q_RE = re.compile(r'_Q(\d+)')
_S_RE = re.compile(r'_S([\d.]+)')
_TF_RE = re.compile(r'_(TF|FF|NTF)_')
_MODEL_RE = re.compile(r'_(QuanONet|HEAQNN|DeepONet|FNN|FNO)_')
_QB_RE = re.compile(r'_(TQ|Qiskit|PL|torchquantum|qiskit|pennylane)_')
_QB_MAP = {'TQ': 'torchquantum', 'Qiskit': 'qiskit', 'PL': 'pennylane'}
_DATA_RE = re.compile(r'_(\d+)x(\d+)_Seed')
# Hamiltonian-ablation suffixes written by logger.get_experiment_id
# (logger.py:81-90); without these a hamiltonian-study checkpoint loaded
# via infer silently got the default ham_bound=[-5,5].
_PAULI_RE = re.compile(r'_Pauli([XYZ])')
_DIAG_RE = re.compile(r'_Diag([^_]+)')
_HAM_RE = re.compile(r'_Ham([^_]+)')
# noise-aware-training suffix (logger.py:
# _Noise{p}[R{readout_p}][G{damp_gamma}][F{dephase_p}]) — the channel is
# part of the training objective, so evaluation reproduces it
_NOISE_RE = re.compile(r'_Noise([0-9.eE+-]+?)(?:R([0-9.eE+-]+?))?'
                       r'(?:G([0-9.eE+-]+?))?(?:F([0-9.eE+-]+))?(?=_|$)')
_NUM_RE = re.compile(r'-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?')
# _Shift[Sh{N}] / _Spsa[C{c}][Sh{N}] — QPU-trainable gradient runs
# (ops/param_shift.py).  Recorded for provenance; the inference forward
# is the same ideal circuit, so these do NOT change the rebuilt model.
_GRAD_RE = re.compile(r'_(Shift|Spsa)(?:C([0-9.eE+-]+?))?(?:Sh(\d+))?'
                      r'(?=_|$)')


def _parse_joined_floats(s):
    """Parse logger's ``"-".join(map(str, values))`` encoding, where a
    value may itself be negative: ``[1, -1]`` encodes as ``"1--1"`` and
    ``[-3, 3]`` as ``"-3-3"``.  Grammar: num ('-' num)*, num = '-'? digits.
    Returns None if the string does not parse."""
    vals, i = [], 0
    while i < len(s):
        m = _NUM_RE.match(s, i)
        if not m:
            return None
        vals.append(float(m.group(0)))
        i = m.end()
        if i < len(s):
            if s[i] != '-':
                return None
            i += 1
    return vals or None

_DEFAULTS = {
    'model_type': 'QuanONet',
    'num_qubits': 5,
    'net_size': [40, 2, 20, 2],
    # NOTE: the reference's infer defaults scale_coeff to 0.1 while its
    # solvers default to 0.01 (documented discrepancy, SURVEY.md §2b);
    # we keep the infer-side value for CLI parity.
    'scale_coeff': 0.1,
    'if_trainable_freq': True,
    'ham_bound': [-5.0, 5.0],
    'ham_diag': None,
    'ham_pauli': 'Z',
    'quantum_backend': 'jax',
    'batch_size': 128,
}


def _parse_path(ckpt_path: str) -> dict:
    """Extract hyper-parameters encoded in the checkpoint directory name
    (reference infer.py:60-86)."""
    name = os.path.basename(os.path.dirname(os.path.abspath(ckpt_path)))
    cfg = {}
    m = _MODEL_RE.search(name)
    if m:
        cfg['model_type'] = m.group(1)
    m = _NET_RE.search(name)
    if m:
        cfg['net_size'] = [int(m.group(i)) for i in range(1, 5)]
    else:
        m = _NET2_RE.search(name)
        if m:
            cfg['net_size'] = [int(m.group(1)), int(m.group(2))]
    m = _Q_RE.search(name)
    if m:
        cfg['num_qubits'] = int(m.group(1))
    m = _S_RE.search(name)
    if m:
        cfg['scale_coeff'] = float(m.group(1))
    m = _TF_RE.search(name)
    if m:
        cfg['if_trainable_freq'] = (m.group(1) == 'TF')
    m = _QB_RE.search(name)
    if m:
        cfg['quantum_backend'] = _QB_MAP.get(m.group(1), m.group(1))
    m = _PAULI_RE.search(name)
    if m:
        cfg['ham_pauli'] = m.group(1)
    m = _DIAG_RE.search(name)
    if m:
        diag = _parse_joined_floats(m.group(1))
        if diag:
            cfg['ham_diag'] = diag
    else:
        m = _HAM_RE.search(name)
        if m:
            bound = _parse_joined_floats(m.group(1))
            if bound and len(bound) == 2:
                cfg['ham_bound'] = bound
    m = _NOISE_RE.search(name)
    if m:
        try:
            p = float(m.group(1))
            cfg['noise_p'] = p if p > 0 else None
            if m.group(2):
                cfg['readout_p'] = float(m.group(2))
            if m.group(3):
                cfg['damp_gamma'] = float(m.group(3))
            if m.group(4):
                cfg['dephase_p'] = float(m.group(4))
        except ValueError:
            pass
    m = _GRAD_RE.search(name)
    if m:
        cfg['grad_method'] = m.group(1).lower()
        if m.group(2):
            cfg['spsa_c'] = float(m.group(2))
        if m.group(3):
            cfg['train_shots'] = int(m.group(3))
    return cfg


def _resolve_config(ckpt_path: str, overrides: dict) -> dict:
    cfg = {**_DEFAULTS, **_parse_path(ckpt_path)}
    cfg.update({k: v for k, v in overrides.items() if v is not None})
    return cfg


def _build_model(cfg: dict, branch_in: int, trunk_in: int):
    from quanonet_tpu.models import (
        FNN, FNO, DeepONet, HEAQNN, QuanONet, deeponet_layer_sizes,
    )
    mt = cfg['model_type']
    net_size = tuple(cfg['net_size'])
    # --noise_p 0 with no readout error is the ideal model: take the exact
    # path, not a 0-probability trajectory ensemble (lets a user force
    # ideal evaluation of a _Noise-suffixed checkpoint)
    if cfg.get('noise_p') is not None and float(cfg['noise_p']) == 0.0 \
            and not cfg.get('readout_p'):
        cfg = {**cfg, 'noise_p': None}
    if mt in ('QuanONet', 'HEAQNN'):
        # inference never differentiates, so Q15/16 may take the
        # forward-only pfused kernel (4.9x/8.6x the fused forward there)
        from quanonet_tpu.ops.hea import resolve_inference_engine
        kw = dict(num_qubits=int(cfg['num_qubits']),
                  engine=resolve_inference_engine(
                      cfg.get('engine') or 'auto', int(cfg['num_qubits'])),
                  net_size=net_size,
                  scale_coeff=float(cfg['scale_coeff']),
                  if_trainable_freq=bool(cfg['if_trainable_freq']),
                  ham_bound=tuple(cfg['ham_bound']),
                  ham_diag=(tuple(cfg['ham_diag'])
                            if cfg.get('ham_diag') is not None else None),
                  ham_pauli=cfg.get('ham_pauli', 'Z'),
                  shots=(int(cfg['shots'])
                         if cfg.get('shots') else None),
                  noise_p=(float(cfg['noise_p'])
                           if cfg.get('noise_p') is not None else None),
                  noise_traj=int(cfg.get('noise_traj') or 32),
                  readout_p=float(cfg.get('readout_p') or 0.0),
                  damp_gamma=(float(cfg['damp_gamma'])
                              if cfg.get('damp_gamma') else None),
                  dephase_p=(float(cfg['dephase_p'])
                             if cfg.get('dephase_p') else None))
        if mt == 'QuanONet':
            return QuanONet(branch_input_size=branch_in,
                            trunk_input_size=trunk_in, **kw)
        return HEAQNN(input_size=branch_in, **kw)
    if mt == 'DeepONet':
        bl, tl = deeponet_layer_sizes(list(net_size), branch_in, trunk_in)
        return DeepONet(branch_layers=bl, trunk_layers=tl)
    if mt == 'FNN':
        return FNN(net_size=net_size)
    if mt == 'FNO':
        ns = list(net_size)
        return FNO(modes=int(ns[0]), width=int(ns[1]),
                   layers=int(ns[2]) if len(ns) > 2 else 3,
                   fc_hidden=int(ns[3]) if len(ns) > 3 else 32)
    raise ValueError(f"Unknown model_type: {mt}")


def load_model(ckpt_path: str, branch_in: int, trunk_in: int = 0,
               **overrides):
    """Load a model from a checkpoint (.ckpt / .npz).

    Returns (model, params, cfg); run inference with
    ``predict(model, params, branch, trunk, cfg=cfg)``.
    """
    import jax
    import jax.numpy as jnp

    cfg = _resolve_config(ckpt_path, overrides)
    raw = ckpt_io.load_raw(ckpt_path)
    mt = cfg['model_type']
    model = _build_model(cfg, branch_in, trunk_in)

    if mt in ('QuanONet', 'HEAQNN'):
        tree = ckpt_io.quantum_params_from_raw(
            raw, mt, tuple(cfg['net_size']), int(cfg['num_qubits']),
            bool(cfg['if_trainable_freq']))
    else:
        tree = ckpt_io.unflatten_tree(raw)
    params = jax.tree_util.tree_map(jnp.asarray, tree)
    cfg['_backend'] = 'jax'
    return model, params, cfg


def predict(model, params, branch_input, trunk_input=None, cfg=None,
            batch_size=None, shot_seed=0):
    """Batched inference (reference infer.py:235-291 signature policy:
    QuanONet/DeepONet take (branch, trunk); FNN takes the concatenation;
    HEAQNN takes branch only; FNO takes the grid tensor).

    batch_size defaults to 20000: inference is a pure forward pass, and
    on the tunneled TPU backend each program dispatch costs ~5 ms RPC
    plus a one-time compile per shape — the reference's 128-sample
    batches would turn a 1-minute job into ~15 minutes.

    When the model was loaded with ``shots`` set (finite-shot QPU
    emulation, ops/sampling.py) or ``noise_p``/``readout_p`` set
    (Pauli-twirled noise trajectories, ops/noise.py), predictions are
    sampled; ``shot_seed`` makes them replayable (each batch gets an
    independent fold of it)."""
    import jax
    import jax.numpy as jnp

    if batch_size is None:
        batch_size = 20000

    model_type = (cfg or {}).get('model_type', 'QuanONet')
    has_trunk_tuple = trunk_input is not None and \
        model_type in ('QuanONet', 'DeepONet')
    has_trunk_concat = trunk_input is not None and model_type in ('FNN',)
    from quanonet_tpu.ops.noise import is_noisy
    noisy = is_noisy(getattr(model, 'noise_p', None),
                     getattr(model, 'readout_p', None),
                     getattr(model, 'damp_gamma', None),
                     getattr(model, 'dephase_p', None))
    sampled = bool(getattr(model, 'shots', None)) or noisy
    rng_name = 'noise' if noisy else 'shots'

    n = branch_input.shape[0]
    if sampled:
        fwd = jax.jit(lambda key, *inp: model.apply(
            params, *inp, rngs={rng_name: key}))
        base_key = jax.random.PRNGKey(shot_seed)
    else:
        fwd = jax.jit(lambda *inp: model.apply(params, *inp))
    preds = []
    for s in range(0, n, batch_size):
        b = jnp.asarray(branch_input[s:s + batch_size].astype(np.float32))
        args = (jax.random.fold_in(base_key, s),) if sampled else ()
        if has_trunk_tuple:
            t = jnp.asarray(trunk_input[s:s + batch_size].astype(np.float32))
            out = fwd(*args, b, t)
        elif has_trunk_concat:
            t = trunk_input[s:s + batch_size].astype(np.float32)
            out = fwd(*args, jnp.asarray(
                np.concatenate([np.asarray(b), t], axis=1)))
        else:
            out = fwd(*args, b)
        preds.append(np.asarray(out))
    return np.concatenate(preds, axis=0)


def zne_predict(model, params, branch_input, trunk_input=None, cfg=None,
                scales=(1.0, 2.0), batch_size=None, shot_seed=0):
    """Zero-noise-extrapolated predictions (ops/mitigation.py): every
    trajectory evaluates all amplified noise levels ``c·noise_p`` on one
    shared error draw (common random numbers) and the predictions are
    Richardson-extrapolated back to c = 0 inside one compiled program.

    The model must have ``noise_p`` set; same-arguments calls replay
    bit-identically."""
    from quanonet_tpu.ops.mitigation import richardson_weights
    p = getattr(model, 'noise_p', None)
    if not p:
        raise ValueError("zne_predict needs a model with noise_p > 0 "
                         "(nothing to extrapolate)")
    richardson_weights(scales)           # validate scales up front
    m = model.clone(zne_scales=tuple(float(c) for c in scales), shots=None)
    return predict(m, params, branch_input, trunk_input, cfg=cfg,
                   batch_size=batch_size, shot_seed=shot_seed)


def evaluate(y_pred, y_true):
    """Rel-L2 / MSE / MAE (reference infer.py:294-302)."""
    m = compute_metrics(y_true, y_pred)
    return {'rel_l2': rel_l2(y_true, y_pred),
            'mse': m['MSE'], 'mae': m['MAE']}


# ── CLI ───────────────────────────────────────────────────────────────────────

def _parser():
    p = argparse.ArgumentParser(
        description='QuanONet-TPU inference',
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument('--ckpt', required=True,
                   help='Checkpoint path (.ckpt / .npz)')
    p.add_argument('--data', default=None,
                   help='.npz with test_branch_input / test_trunk_input '
                        '/ test_output')
    p.add_argument('--branch', default=None,
                   help='Branch input .npy (alternative to --data)')
    p.add_argument('--trunk', default=None, help='Trunk input .npy')
    p.add_argument('--num_points_0', type=int, default=None)
    p.add_argument('--output', default=None,
                   help='Save predictions to .npy or .npz')
    p.add_argument('--batch_size', type=int, default=None,
                   help='Inference batch (default 20000; forward-only, '
                        'large batches amortize per-dispatch RPC cost)')
    p.add_argument('--model_type', default=None)
    p.add_argument('--num_qubits', type=int, default=None)
    p.add_argument('--net_size', type=int, nargs='+', default=None)
    p.add_argument('--scale_coeff', type=float, default=None)
    p.add_argument('--quantum_backend', default=None,
                   choices=['mindquantum', 'torchquantum', 'qiskit',
                            'pennylane', 'jax'],
                   help='CLI-compat override (reference infer.py:327); '
                        'every backend maps onto the one JAX engine here, '
                        'so this only annotates the config')
    p.add_argument('--ham_bound', type=float, nargs=2, default=None)
    p.add_argument('--shots', type=int, default=None,
                   help='Finite-shot measurement sampling (QPU emulation): '
                        'estimate each prediction from N sampled shots '
                        'instead of the exact expectation')
    p.add_argument('--shot_seed', type=int, default=0,
                   help='PRNG seed for --shots sampling (replayable)')
    p.add_argument('--noise_p', type=float, default=None,
                   help='Per-qubit per-block depolarizing error prob '
                        '(Pauli-twirled trajectory simulation, '
                        'ops/noise.py); combine with --shots for the full '
                        'QPU error budget')
    p.add_argument('--noise_traj', type=int, default=None,
                   help='Noise trajectories to average (default 32)')
    p.add_argument('--readout_p', type=float, default=None,
                   help='Per-qubit measurement bit-flip prob, applied '
                        'exactly (no sampling)')
    p.add_argument('--zne', type=float, nargs='+', default=None,
                   metavar='SCALE',
                   help='Zero-noise extrapolation (ops/mitigation.py): '
                        'evaluate at these noise scale factors and '
                        'Richardson-extrapolate the predictions to zero '
                        'noise; requires --noise_p or a _Noise '
                        'checkpoint.  Use the measured-best 2-point '
                        '"--zne 1 2" — 3-point weights amplify '
                        'trajectory variance ~6x (docs/BENCHMARKS.md)')
    p.add_argument('--t1_us', type=float, default=None,
                   help='Calibration T1 (µs): adds the amplitude-damping '
                        '(MCWF quantum-jump) channel per block; needs '
                        '--block_time_us')
    p.add_argument('--t2_us', type=float, default=None,
                   help='Calibration T2 (µs): adds the pure-dephasing '
                        '(Z-twirl) channel per block; needs --block_time_us')
    p.add_argument('--block_time_us', type=float, default=None,
                   help='Hardware wall-time one HEA block occupies (µs); '
                        'converts --t1_us/--t2_us to per-block (γ, p_φ) '
                        'via ops.noise.channel_params_from_t1t2')
    p.add_argument('--damp_gamma', type=float, default=None,
                   help='Directly set the per-block amplitude-damping γ '
                        '(overrides --t1_us)')
    p.add_argument('--dephase_p', type=float, default=None,
                   help='Directly set the per-block pure-dephasing Z-flip '
                        'prob (overrides --t2_us)')
    return p


def main(argv=None):
    args = _parser().parse_args(argv)
    # persistent XLA compilation cache: cold compiles on the TPU tunnel
    # cost ~200s per program shape, ~15s cached
    from quanonet_tpu.solver import enable_compilation_cache
    enable_compilation_cache()

    y_true = None
    if args.data:
        d = np.load(args.data)
        branch = d['test_branch_input'] if 'test_branch_input' in d.files \
            else d['test_input']
        trunk = d['test_trunk_input'] if 'test_trunk_input' in d.files \
            else None
        if 'test_output' in d.files:
            y_true = d['test_output']
    elif args.branch:
        branch = np.load(args.branch)
        trunk = np.load(args.trunk) if args.trunk else None
    else:
        # auto-generate test data from the checkpoint dirname
        # (reference infer.py:348-384; its cfg_for_dims NameError fixed)
        dir_name = os.path.basename(
            os.path.dirname(os.path.abspath(args.ckpt)))
        m_op = _MODEL_RE.search(dir_name)
        m_data = _DATA_RE.search(dir_name)
        operator = dir_name.split('_')[0] if dir_name else None
        if not operator or not m_op:
            raise SystemExit("Provide --data <file.npz> or "
                             "--branch <file.npy>.")
        num_train = int(m_data.group(1)) if m_data else 1000
        num_points = int(m_data.group(2)) if m_data else 100
        cfg_for_dims = _resolve_config(args.ckpt, {})
        model_type_for_data = m_op.group(1)
        if model_type_for_data in ('QuanONet', 'HEAQNN'):
            branch_depth = cfg_for_dims['net_size'][0]
            num_qubits = cfg_for_dims['num_qubits']
            inferred_p0 = min(num_points, num_qubits * branch_depth)
        else:
            inferred_p0 = num_points
        num_points_0 = (args.num_points_0 if args.num_points_0 is not None
                        else inferred_p0)
        from quanonet_tpu.data.manager import DataManager
        data_cfg = {
            'operator': operator, 'model_type': model_type_for_data,
            'num_train': num_train, 'num_test': 1000,
            'num_points': num_points, 'num_points_0': num_points_0,
            'train_sample_num': 10, 'test_sample_num': 100,
        }
        print(f"[Auto] Generating test data for {operator} "
              f"(num_points={num_points}, num_points_0={num_points_0}) ...")
        data = DataManager(data_cfg).get_data()
        branch = (data['test_branch_input']
                  if 'test_branch_input' in data else data['test_input'])
        trunk = data.get('test_trunk_input')
        y_true = data.get('test_output')

    branch_in = branch.shape[-1] if branch.ndim == 3 else branch.shape[1]
    trunk_in = trunk.shape[1] if trunk is not None else 0

    # T1/T2 decoherence: --t1_us/--t2_us + --block_time_us map calibration
    # times to per-block channel strengths; --damp_gamma/--dephase_p set
    # them directly
    damp_gamma, dephase_p = args.damp_gamma, args.dephase_p
    if args.t1_us is not None or args.t2_us is not None:
        if args.block_time_us is None:
            raise SystemExit("--t1_us/--t2_us need --block_time_us")
        from quanonet_tpu.ops.noise import channel_params_from_t1t2
        g, pphi = channel_params_from_t1t2(
            args.block_time_us, args.t1_us or 1e12, args.t2_us or 1e12)
        if damp_gamma is None and args.t1_us is not None:
            damp_gamma = g
        if dephase_p is None and args.t2_us is not None:
            dephase_p = pphi
        print(f"T1/T2 : block={args.block_time_us}us "
              f"T1={args.t1_us}us T2={args.t2_us}us -> "
              f"damp_gamma={damp_gamma} dephase_p={dephase_p}")

    overrides = dict(model_type=args.model_type, num_qubits=args.num_qubits,
                     net_size=args.net_size, scale_coeff=args.scale_coeff,
                     ham_bound=args.ham_bound,
                     quantum_backend=args.quantum_backend,
                     shots=args.shots, noise_p=args.noise_p,
                     noise_traj=args.noise_traj, readout_p=args.readout_p,
                     damp_gamma=damp_gamma, dephase_p=dephase_p)
    model, params, cfg = load_model(args.ckpt, branch_in=branch_in,
                                    trunk_in=trunk_in, **overrides)
    print(f"Model : {cfg['model_type']}  backend={cfg['_backend']}")
    print(f"Config: net_size={cfg['net_size']}  "
          f"num_qubits={cfg.get('num_qubits', '-')}")
    if cfg.get('shots'):
        print(f"Shots : {cfg['shots']} per prediction "
              f"(sampled measurement, seed={args.shot_seed})")
    if cfg.get('noise_p') is not None or cfg.get('readout_p'):
        print(f"Noise : depolarizing p={cfg.get('noise_p') or 0} over "
              f"{cfg.get('noise_traj') or 32} trajectories, "
              f"readout_p={cfg.get('readout_p') or 0} "
              f"(seed={args.shot_seed})")

    if args.zne:
        print(f"ZNE   : Richardson extrapolation over noise scales "
              f"{args.zne}")
        preds = zne_predict(model, params, branch, trunk, cfg=cfg,
                            scales=tuple(args.zne),
                            batch_size=args.batch_size,
                            shot_seed=args.shot_seed)
    else:
        preds = predict(model, params, branch, trunk, cfg=cfg,
                        batch_size=args.batch_size, shot_seed=args.shot_seed)
    print(f"Output: {preds.shape}")

    if y_true is not None:
        m = evaluate(preds, y_true)
        print(f"Rel-L2 : {m['rel_l2']:.4f}  ({m['rel_l2']:.2%})")
        print(f"MSE    : {m['mse']:.6f}")
        print(f"MAE    : {m['mae']:.6f}")

    if args.output:
        if args.output.endswith('.npz'):
            np.savez(args.output, predictions=preds,
                     **(evaluate(preds, y_true) if y_true is not None else {}))
        else:
            np.save(args.output, preds)
        print(f"Saved  : {args.output}")
    return preds


if __name__ == '__main__':
    main()
