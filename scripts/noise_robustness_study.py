#!/usr/bin/env python
"""
Noise-robustness study: does training THROUGH the hardware noise channel
(--noise_p, ops/noise.py) beat deploying an ideally-trained model on the
same noisy hardware?  Beyond-reference capability demo: the reference can
only answer this by burning QPU time; here the whole experiment runs on
the simulator with a calibrated channel.

Protocol (Antideriv Q2, the reference demo config at a reduced budget):
  1. train IDEAL  : standard training, exact expectations
  2. train NOISY  : same seed/budget, per-step resampled Pauli
                    trajectories at noise_p = P (+ readout)
  3. evaluate BOTH checkpoints under noisy inference at
     p in {0, P/2, P, 2P} (64 trajectories), plus ZNE at p = P
Writes docs/noise_robustness.csv and prints a verdict line:
the noise-trained model must win at its training noise level.

Run: python scripts/noise_robustness_study.py   (TPU or CPU; Q2 is tiny —
     the shipped docs/noise_robustness.csv ran on the v5e in ~5 min)
"""
import argparse
import csv
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def train_one(cfg):
    from quanonet_tpu.solver import Solver
    solver = Solver(dict(cfg))
    try:
        history = solver.train()
    except SystemExit as e:
        # Solver.train() resume-skips completed experiments with
        # sys.exit(0); for the study that means "reuse the checkpoint"
        # (e.g. the ideal run is shared between channel modes)
        if e.code != 0:
            raise
        print(f"  [resume-skip] reusing completed run "
              f"{solver.exp_logger.exp_dir}", flush=True)
        return solver.exp_logger.exp_dir
    solver.evaluate(history)
    return solver.exp_logger.exp_dir


def eval_under_noise(ckpt, data, p, readout_p, zne=None, traj=64, seed=0,
                     damp_gamma=None, dephase_p=None):
    from quanonet_tpu.infer import (evaluate, load_model, predict,
                                    zne_predict)
    # 0.0 values are passed explicitly: _resolve_config treats None as
    # "no override", so a _Noise…G…F… run dir's parsed channels would
    # otherwise leak into the ideal evaluation
    if p > 0 or readout_p or damp_gamma or dephase_p:
        overrides = dict(noise_p=p, noise_traj=traj, readout_p=readout_p,
                         damp_gamma=damp_gamma or 0.0,
                         dephase_p=dephase_p or 0.0)
    else:
        overrides = dict(noise_p=0.0, readout_p=0.0,
                         damp_gamma=0.0, dephase_p=0.0)
    model, params, cfg = load_model(
        ckpt, branch_in=data['test_branch_input'].shape[1],
        trunk_in=data['test_trunk_input'].shape[1], **overrides)
    if zne:
        preds = zne_predict(model, params, data['test_branch_input'],
                            data['test_trunk_input'], cfg=cfg,
                            scales=tuple(zne), shot_seed=seed)
    else:
        preds = predict(model, params, data['test_branch_input'],
                        data['test_trunk_input'], cfg=cfg, shot_seed=seed)
    return evaluate(preds, data['test_output'])['rel_l2']


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--noise_p', type=float, default=0.02,
                    help='training/deployment channel strength P')
    ap.add_argument('--readout_p', type=float, default=0.01)
    ap.add_argument('--epochs', type=int, default=300)
    ap.add_argument('--traj', type=int, default=8,
                    help='training trajectories per step')
    ap.add_argument('--eval_traj', type=int, default=64)
    ap.add_argument('--prefix', default='outputs_noise_study')
    ap.add_argument('--channel', choices=('depolarizing', 't1t2'),
                    default='depolarizing',
                    help="t1t2: train/eval through amplitude damping + "
                         "pure dephasing (MCWF, ops/noise.py) instead of "
                         "the depolarizing channel; no ZNE (Richardson "
                         "scaling applies to noise_p only)")
    ap.add_argument('--damp_gamma', type=float, default=0.01,
                    help='t1t2 mode: per-block T1 damping γ')
    ap.add_argument('--dephase_p', type=float, default=0.003,
                    help='t1t2 mode: per-block T2 Z-flip prob')
    ap.add_argument('--out', default=None)
    args = ap.parse_args()
    P = args.noise_p
    docs = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), 'docs')
    if args.out is None:
        args.out = os.path.join(
            docs, 'noise_robustness.csv' if args.channel == 'depolarizing'
            else 'noise_robustness_t1t2.csv')

    base = dict(operator='Antideriv', model_type='QuanONet',
                num_train=1000, num_test=1000, num_points=100,
                num_points_0=10, train_sample_num=10, test_sample_num=100,
                batch_size=100, num_epochs=args.epochs, learning_rate=3e-3,
                lr_scheduler='cosine',
                num_qubits=2, net_size=[5, 1, 5, 1], scale_coeff=0.001,
                if_trainable_freq='true', ham_bound=[-5, 5],
                ham_pauli='Z', seed=0, prefix=args.prefix)

    print(f"=== training IDEAL (epochs={args.epochs}) ===", flush=True)
    ideal_dir = train_one(base)
    if args.channel == 't1t2':
        G, F = args.damp_gamma, args.dephase_p
        print(f"=== training NOISE-AWARE (T1/T2: γ={G}, p_φ={F}, "
              f"traj={args.traj}) ===", flush=True)
        noisy_dir = train_one(dict(base, damp_gamma=G, dephase_p=F,
                                   noise_traj=args.traj))
    else:
        print(f"=== training NOISE-AWARE (P={P}, R={args.readout_p}, "
              f"traj={args.traj}) ===", flush=True)
        noisy_dir = train_one(dict(base, noise_p=P, noise_traj=args.traj,
                                   readout_p=args.readout_p))

    from quanonet_tpu.data.manager import DataManager
    data = DataManager(dict(base)).get_data()

    rows = []
    if args.channel == 't1t2':
        G, F = args.damp_gamma, args.dephase_p
        levels = [(0.0, 0.0), (G / 2, F / 2), (G, F), (2 * G, 2 * F)]
        for name, d in (('ideal', ideal_dir), ('noise_aware', noisy_dir)):
            ckpt = os.path.join(d, 'best_model.npz')
            for g, f_ in levels:
                r = eval_under_noise(ckpt, data, 0.0, 0.0,
                                     traj=args.eval_traj,
                                     damp_gamma=g, dephase_p=f_)
                rows.append(dict(trained=name, eval_damp_gamma=g,
                                 eval_dephase_p=f_,
                                 rel_l2=round(float(r), 5)))
                print(f"  {name:12s} @ γ={g:<7g} p_φ={f_:<7g} "
                      f"rel_l2={r:.4f}", flush=True)
    else:
        levels = [(0.0, 0.0), (P / 2, args.readout_p), (P, args.readout_p),
                  (2 * P, args.readout_p)]
        for name, d in (('ideal', ideal_dir), ('noise_aware', noisy_dir)):
            ckpt = os.path.join(d, 'best_model.npz')
            for p, ro in levels:
                r = eval_under_noise(ckpt, data, p, ro, traj=args.eval_traj)
                rows.append(dict(trained=name, eval_noise_p=p,
                                 eval_readout_p=ro,
                                 zne='', rel_l2=round(float(r), 5)))
                print(f"  {name:12s} @ p={p:<6g} ro={ro:<5g} rel_l2={r:.4f}",
                      flush=True)
            r = eval_under_noise(ckpt, data, P, args.readout_p,
                                 zne=(1.0, 2.0, 3.0), traj=args.eval_traj)
            rows.append(dict(trained=name, eval_noise_p=P,
                             eval_readout_p=args.readout_p, zne='1-2-3',
                             rel_l2=round(float(r), 5)))
            print(f"  {name:12s} @ p={P:<6g} + ZNE(1,2,3)   rel_l2={r:.4f}",
                  flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, 'w', newline='') as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {args.out}")

    if args.channel == 't1t2':
        G = args.damp_gamma

        def get_t(trained):
            return next(r['rel_l2'] for r in rows
                        if r['trained'] == trained
                        and r['eval_damp_gamma'] == G)
        ideal_at_p, robust_at_p = get_t('ideal'), get_t('noise_aware')
        label = f"T1/T2 γ={G}, p_φ={args.dephase_p}"
    else:
        def get(trained, p, zne=''):
            return next(r['rel_l2'] for r in rows
                        if r['trained'] == trained
                        and r['eval_noise_p'] == p and r['zne'] == zne)
        ideal_at_p, robust_at_p = get('ideal', P), get('noise_aware', P)
        label = f"p={P}"
    print(f"\nVERDICT @ deployment noise {label}: ideal-trained "
          f"{ideal_at_p:.4f} vs noise-trained {robust_at_p:.4f} -> "
          f"{'noise-aware training WINS' if robust_at_p < ideal_at_p else 'no win'}")
    return 0 if robust_at_p < ideal_at_p else 1


if __name__ == '__main__':
    raise SystemExit(main())
