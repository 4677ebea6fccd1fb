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
    history = solver.train()
    solver.evaluate(history)
    return solver.exp_logger.exp_dir


def eval_under_noise(ckpt, data, p, readout_p, zne=None, traj=64, seed=0):
    from quanonet_tpu.infer import (evaluate, load_model, predict,
                                    zne_predict)
    overrides = {}
    if p > 0 or readout_p:
        overrides = dict(noise_p=p, noise_traj=traj, readout_p=readout_p)
    else:
        overrides = dict(noise_p=0.0, readout_p=0.0)
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
    ap.add_argument('--out', default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        'docs', 'noise_robustness.csv'))
    args = ap.parse_args()
    P = args.noise_p

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
    print(f"=== training NOISE-AWARE (P={P}, R={args.readout_p}, "
          f"traj={args.traj}) ===", flush=True)
    noisy_dir = train_one(dict(base, noise_p=P, noise_traj=args.traj,
                               readout_p=args.readout_p))

    from quanonet_tpu.data.manager import DataManager
    data = DataManager(dict(base)).get_data()

    rows = []
    levels = [(0.0, 0.0), (P / 2, args.readout_p), (P, args.readout_p),
              (2 * P, args.readout_p)]
    for name, d in (('ideal', ideal_dir), ('noise_aware', noisy_dir)):
        ckpt = os.path.join(d, 'best_model.npz')
        for p, ro in levels:
            r = eval_under_noise(ckpt, data, p, ro, traj=args.eval_traj)
            rows.append(dict(trained=name, eval_noise_p=p, eval_readout_p=ro,
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

    def get(trained, p, zne=''):
        return next(r['rel_l2'] for r in rows
                    if r['trained'] == trained and r['eval_noise_p'] == p
                    and r['zne'] == zne)
    ideal_at_p, robust_at_p = get('ideal', P), get('noise_aware', P)
    print(f"\nVERDICT @ deployment noise p={P}: ideal-trained "
          f"{ideal_at_p:.4f} vs noise-trained {robust_at_p:.4f} -> "
          f"{'noise-aware training WINS' if robust_at_p < ideal_at_p else 'no win'}")
    return 0 if robust_at_p < ideal_at_p else 1


if __name__ == '__main__':
    raise SystemExit(main())
