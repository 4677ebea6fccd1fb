#!/usr/bin/env python
"""
Hardware-trainability study: what does training with the gradients a real
QPU can actually provide (ops/param_shift.py) cost in quality and
throughput vs exact autodiff?  Beyond-reference capability demo — the
reference delegates parameter-shift to Qiskit's EstimatorQNN and never
measures it; here every arm runs through the same solver on the same
budget.

Arms (Antideriv Q2, the noise-study config: 10K train samples, bs=100,
cosine 3e-3):

  autodiff            exact gradients through the statevector (baseline)
  shift               exact two-point parameter-shift VJP — mathematically
                      the same gradient, so its quality must MATCH
                      autodiff (a strong end-to-end validation of the
                      shift rule); throughput shows the 2·P-evaluation
                      fan-out cost a QPU pays
  spsa                Spall 2-evaluation simultaneous perturbation — the
                      cheapest hardware estimator; noisy updates need
                      more epochs (a 10x-budget arm shows the trade)
  shift @ N shots     finite-shot SAMPLED expectations in every shifted
                      evaluation (multinomial readout, ops/sampling.py) —
                      the full QPU training condition, N ∈ {256, 8192}
  spsa @ 1024 shots   SPSA under sampled readout (2 evals/step makes it
                      the shot-frugal choice)

Writes docs/hardware_training.csv (method, train_shots, epochs, rel_l2,
circuit_evals_per_step = the cost a QPU pays, samples/sec incl. one-time
compile) and prints verdict lines:
  * shift must match autodiff rel-L2 within 10% relative,
  * shift quality must improve (or hold) as the shot budget grows.

Run: python scripts/hardware_training_study.py   (TPU or CPU; Q2 is tiny)
     --quick trims to {autodiff, shift, spsa} at 30 epochs for CI-style
     smoke runs.
"""
import argparse
import csv
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def train_arm(cfg):
    from quanonet_tpu.solver import Solver
    solver = Solver(dict(cfg))
    try:
        history = solver.train()
    except SystemExit as e:
        if e.code != 0:
            raise
        print(f"  [resume-skip] reusing {solver.exp_logger.exp_dir}",
              flush=True)
        return solver.exp_logger.exp_dir
    solver.evaluate(history)
    return solver.exp_logger.exp_dir


def harvest(exp_dir):
    with open(os.path.join(exp_dir, 'metric.json')) as f:
        m = json.load(f)
    met = m.get('metrics', m)
    return (float(met['rel_l2']),
            float(met.get('train_samples_per_sec') or 0.0))


def evals_per_step(grad_method, num_qubits, net_size):
    """Circuit evaluations per optimizer step — the cost metric that
    matters on hardware (each evaluation is one batch of QPU jobs).
    autodiff: 1 (fwd+bwd through the simulator state, impossible on a
    QPU); shift: 1 primal + 2 per shifted parameter (ansatz 3·nq per
    sublayer + one encode angle per (block, qubit)); spsa: 2."""
    if grad_method == 'autodiff':
        return 1
    if grad_method == 'spsa':
        return 2
    bd, bld, td, tld = net_size
    subs = bd * bld + td * tld
    n_ansatz = subs * 3 * num_qubits
    n_encode = (bd + td) * num_qubits
    return 1 + 2 * (n_ansatz + n_encode)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--epochs', type=int, default=300)
    ap.add_argument('--match_seeds', type=int, default=3,
                    help='seeds for the autodiff/shift arms (the '
                         'shift≡autodiff verdict holds per-seed); the '
                         'other arms run seed 0 only')
    ap.add_argument('--prefix', default='outputs_hw_study')
    ap.add_argument('--quick', action='store_true')
    ap.add_argument('--out', default=None)
    args = ap.parse_args()
    docs = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), 'docs')
    out = args.out or os.path.join(docs, 'hardware_training.csv')

    base = dict(operator='Antideriv', model_type='QuanONet',
                num_train=1000, num_test=1000, num_points=100,
                num_points_0=10, train_sample_num=10, test_sample_num=100,
                batch_size=100, num_epochs=args.epochs, learning_rate=3e-3,
                lr_scheduler='cosine',
                num_qubits=2, net_size=[5, 1, 5, 1], scale_coeff=0.001,
                if_trainable_freq='true', ham_bound=[-5, 5],
                ham_pauli='Z', seed=0, prefix=args.prefix)
    if args.quick:
        base['num_epochs'] = 30

    n_match = 1 if args.quick else max(1, args.match_seeds)
    arms = [(f'autodiff', dict(seed=k)) for k in range(n_match)]
    arms += [(f'shift', dict(grad_method='shift', seed=k))
             for k in range(n_match)]
    arms += [('spsa', dict(grad_method='spsa'))]
    if not args.quick:
        # run-IDs do not encode num_epochs (reference contract), so arms
        # that differ ONLY by epochs need their own prefix or the second
        # one resume-skips into the first's experiment dir
        arms += [
            ('spsa_10x', dict(grad_method='spsa',
                              num_epochs=args.epochs * 10,
                              prefix=args.prefix + '_10x')),
            ('shift@256', dict(grad_method='shift', train_shots=256)),
            ('shift@8192', dict(grad_method='shift', train_shots=8192)),
            ('spsa@1024', dict(grad_method='spsa', train_shots=1024,
                               num_epochs=args.epochs * 10,
                               prefix=args.prefix + '_10x')),
        ]

    rows = []
    for name, extra in arms:
        print(f"=== arm {name} ===", flush=True)
        d = train_arm(dict(base, **extra))
        rel, sps = harvest(d)
        gm = extra.get('grad_method', 'autodiff')
        rows.append(dict(method=name, grad_method=gm,
                         seed=extra.get('seed', 0),
                         train_shots=extra.get('train_shots', ''),
                         epochs=extra.get('num_epochs', base['num_epochs']),
                         rel_l2=round(rel, 5),
                         circuit_evals_per_step=evals_per_step(
                             gm, base['num_qubits'], base['net_size']),
                         samples_per_sec_incl_compile=round(sps, 1)))
        print(f"  {name:12s} rel_l2={rel:.4f}  {sps:,.0f} samples/s",
              flush=True)

    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, 'w', newline='') as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {out}")

    def get(name, seed=0):
        return next((r['rel_l2'] for r in rows
                     if r['method'] == name and r.get('seed', 0) == seed),
                    None)
    ok = True
    for k in range(n_match):
        auto, shift = get('autodiff', k), get('shift', k)
        if auto is None or shift is None:
            continue
        match = abs(shift - auto) <= 0.10 * max(auto, 1e-9)
        print(f"VERDICT shift≡autodiff (seed {k}): {shift:.4f} vs "
              f"{auto:.4f} -> {'MATCH' if match else 'MISMATCH'}")
        ok &= match
    lo, hi = get('shift@256'), get('shift@8192')
    if lo is not None and hi is not None:
        mono = hi <= lo * 1.05       # more shots may not hurt (5% slack)
        print(f"VERDICT shot budget: shift@8192 {hi:.4f} <= "
              f"shift@256 {lo:.4f} (+5%) -> {'PASS' if mono else 'FAIL'}")
        ok &= mono
    return 0 if ok else 1


if __name__ == '__main__':
    raise SystemExit(main())
