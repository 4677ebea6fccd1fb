#!/usr/bin/env python3
"""
Validate the reference paper's headline orderings from harvested sweep
CSVs (docs/*.csv, produced by scripts/collect_results.py).

Checks, per operator, using each config family's BEST scale (the paper
also reports per-family best hyperparameters):

  1. TF-QuanONet beats FF-QuanONet        (trainable frequencies help)
  2. QuanONet beats HEAQNN                (branch/trunk split helps)
  3. TF-QuanONet is competitive with the classical baselines
     (within 2x of the better of DeepONet/FNN, and beats them on at
     least one operator)

Exit 0 if every available check passes, 1 otherwise; operators whose
rows are not yet harvested are reported as SKIP.  Reference:
scripts/reproduce_benchmarks1.sh regimes (identical tables).
"""
import csv
import sys
from collections import defaultdict

PATH = sys.argv[1] if len(sys.argv) > 1 else 'docs/benchmarks1_results.csv'


def family(config):
    """('QuanONet'|'HEAQNN'|'DeepONet'|'FNN', 'TF'|'FF'|'')"""
    parts = config.split('_')
    model = parts[1]
    freq = 'TF' if '_TF_' in config else ('FF' if '_FF_' in config else '')
    return model, freq


def main():
    best = defaultdict(dict)   # operator -> (model, freq) -> min mean rel_l2
    with open(PATH) as f:
        for row in csv.DictReader(f):
            op = row['operator']
            key = family(row['config'])
            v = float(row['rel_l2_mean'])
            if key not in best[op] or v < best[op][key]:
                best[op][key] = v

    failures, checks = [], 0
    quanonet_beats_classical = 0
    for op in sorted(best):
        b = best[op]
        qtf = b.get(('QuanONet', 'TF'))
        qff = b.get(('QuanONet', 'FF'))
        htf = b.get(('HEAQNN', 'TF'))
        classical = [v for k, v in b.items()
                     if k[0] in ('DeepONet', 'FNN')]

        def check(name, ok):
            nonlocal checks
            if ok is None:
                print(f"  SKIP {name} (rows missing)")
                return
            checks += 1
            print(f"  {'PASS' if ok else 'FAIL'} {name}")
            if not ok:
                failures.append(f"{op}: {name}")

        print(f"{op}:")
        check("TF-QuanONet < FF-QuanONet",
              None if qtf is None or qff is None else qtf < qff)
        check("TF-QuanONet < TF-HEAQNN",
              None if qtf is None or htf is None else qtf < htf)
        if qtf is not None and classical:
            best_classical = min(classical)
            check("TF-QuanONet within 2x of best classical",
                  qtf < 2.0 * best_classical)
            if qtf < best_classical:
                quanonet_beats_classical += 1

    print(f"\n{checks} checks run; TF-QuanONet beats the best classical "
          f"baseline outright on {quanonet_beats_classical} operator(s)")
    if quanonet_beats_classical == 0 and checks:
        failures.append("TF-QuanONet beats classical on zero operators")
    if failures:
        print("FAILURES:", *failures, sep="\n  ")
        return 1
    print("paper orderings reproduce ✓")
    return 0


def capacity_main():
    """Capacity-study trend checks (reference reproduce_capacity.sh:
    Q2 TF-QuanONet HBxHT grid + DeepONet depth x width grid at p=4).

    The paper's claim is capacity SATURATION: with latent dimension
    pinned (quantum p = 2^n = 4 at Q2; classical p = 4), adding width or
    depth stops helping — both families plateau, and they plateau at
    comparable error (the 2^n ↔ p correspondence).  Checks:

      1. Q2 QuanONet grid saturates: best mean rel-L2 over the grid is
         within 2x of the grid median (no unbounded capacity scaling).
      2. DeepONet p=4 grid saturates the same way (among non-divergent
         configs, mean rel-L2 < 1: very deep-narrow or shallow-wide
         extremes can fail to train at lr 1e-4, which is itself the
         reference's expected behaviour, not a capacity trend).
      3. The two plateaus are comparable: best Q2 QuanONet within 2x of
         best DeepONet (either direction).
    """
    import statistics
    q_means, d_means = [], []
    with open(PATH) as f:
        for row in csv.DictReader(f):
            v = float(row['rel_l2_mean'])
            if '_QuanONet_' in row['config'] and '_Q2_' in row['config']:
                q_means.append(v)
            elif '_DeepONet_' in row['config']:
                d_means.append(v)
    print(f"capacity rows: {len(q_means)} QuanONet Q2, "
          f"{len(d_means)} DeepONet")
    if len(q_means) < 10 or len(d_means) < 10:
        print("SKIP capacity checks (grid not harvested yet)")
        return 0
    failures = []

    def check(name, ok):
        print(f"  {'PASS' if ok else 'FAIL'} {name}")
        if not ok:
            failures.append(name)

    d_conv = [v for v in d_means if v < 1.0]
    check("Q2 QuanONet saturates (best within 2x of median)",
          min(q_means) * 2.0 >= statistics.median(q_means))
    check("DeepONet p=4 saturates (best within 2x of converged median)",
          bool(d_conv) and min(d_conv) * 2.0 >= statistics.median(d_conv))
    check("plateaus comparable (best Q2 within 2x of best DeepONet)",
          bool(d_conv) and 0.5 <= min(q_means) / min(d_conv) <= 2.0)
    if failures:
        print("FAILURES:", *failures, sep="\n  ")
        return 1
    print("capacity trends reproduce ✓")
    return 0


def circuit_main():
    """Circuit-size-study trend checks (reference reproduce_circuit.sh:
    Q2/Q5/Q10 grids, HB qubit-dependent {50,100}/{20,40}/{10,20},
    HT in {10,20,30,40}, 5 seeds per config).

    The paper's claims: (1) going Q2 -> Q5 helps across the grid (the
    2^n latent dimension is the capacity lever), and (2) the largest
    circuits train WORSE at the fixed epoch budget — the Q10 grid's bad
    corners degrade past anything in the Q5 grid (larger circuits are
    harder to optimize; the reference reports the same).  Plus seed
    parity: every row must carry the reference's 5 seeds."""
    rows = []
    with open(PATH) as f:
        for row in csv.DictReader(f):
            import re
            q = int(re.search(r'_Q(\d+)_', row['config']).group(1))
            ht = int(re.search(r'_Net\d+-\d+-(\d+)-\d+_',
                               row['config']).group(1))
            rows.append((q, ht, int(row['seeds']),
                         float(row['rel_l2_mean'])))
    by_q = defaultdict(list)
    for q, ht, seeds, v in rows:
        by_q[q].append(v)
    print(f"circuit rows: " + ", ".join(
        f"Q{q}:{len(by_q[q])}" for q in sorted(by_q)))
    if any(len(by_q.get(q, [])) < 8 for q in (2, 5, 10)):
        print("SKIP circuit checks (grids not harvested yet)")
        return 0
    failures = []

    def check(name, ok):
        print(f"  {'PASS' if ok else 'FAIL'} {name}")
        if not ok:
            failures.append(name)

    check("all rows at reference seed count (5)",
          all(s == 5 for _, _, s, _ in rows))
    for ht in (10, 20, 30, 40):
        q2 = [v for q, h, _, v in rows if q == 2 and h == ht]
        q5 = [v for q, h, _, v in rows if q == 5 and h == ht]
        check(f"Q5 beats Q2 at HT={ht} (best-of-HB)",
              bool(q2) and bool(q5) and min(q5) < min(q2))
    check("Q10 worst corner degrades past the whole Q5 grid",
          max(by_q[10]) > max(by_q[5]))
    if failures:
        print("FAILURES:", *failures, sep="\n  ")
        return 1
    print("circuit-size trends reproduce ✓")
    return 0


def hamiltonian_main():
    """Hamiltonian-study trend checks (reference reproduce_hamiltonian.sh:
    Q5 bound sweep Ham-b..b for b in 1..10, PauliX/Y observables, Q2
    diagonal-spectrum ablations; 5 seeds each, docs/hamiltonian_results.csv).

    The paper's claims: (1) the readout Hamiltonian's spectral bound must
    COVER the target's range — b=1 clips the operator output and is
    catastrophically worse; (2) the bound has an interior optimum (too
    loose wastes dynamic range, mildly degrading toward b=10); (3) the
    Pauli basis of the observable is immaterial (X/Y match the Z
    default); (4) spectra with more distinct eigenvalues read out more
    information — the 3-distinct-value Q2 diagonals beat the 2-or-fewer
    (all-equal = identity-like constant readout)."""
    import re
    base = None          # Q5 default (PauliZ, default bound)
    bounds = {}          # b -> mean rel-L2
    pauli = {}           # 'X'|'Y' -> mean rel-L2
    diag = {}            # exact config suffix -> mean rel-L2
    with open(PATH) as f:
        for row in csv.DictReader(f):
            cfg, v = row['config'], float(row['rel_l2_mean'])
            m = re.search(r'_Ham-([\d.]+)-[\d.]+_', cfg)
            if m:
                bounds[float(m.group(1))] = v
            elif '_PauliX_' in cfg:
                pauli['X'] = v
            elif '_PauliY_' in cfg:
                pauli['Y'] = v
            elif '_Diag' in cfg:
                diag[re.search(r'_Diag([^_]+)_', cfg).group(1)] = v
            elif '_Q5_' in cfg:
                base = v
    print(f"hamiltonian rows: {len(bounds)} bounds, {len(pauli)} pauli, "
          f"{len(diag)} diag, base={'yes' if base else 'no'}")
    if (len(bounds) < 5 or len(pauli) < 2 or len(diag) < 4 or base is None
            or 1.0 not in bounds or 10.0 not in bounds):
        print("SKIP hamiltonian checks (study not harvested yet)")
        return 0
    failures = []

    def check(name, ok):
        print(f"  {'PASS' if ok else 'FAIL'} {name}")
        if not ok:
            failures.append(name)

    b_best = min(bounds, key=bounds.get)
    check("too-tight bound (b=1) is the worst bound config",
          bounds[1.0] == max(bounds.values()))
    check("too-tight bound clips hard (>=2.5x the best bound)",
          bounds[1.0] >= 2.5 * bounds[b_best])
    check("bound has an interior optimum (best strictly inside 1..10)",
          1.0 < b_best < 10.0
          and bounds[1.0] > bounds[b_best] and bounds[10.0] > bounds[b_best])
    check("observable basis immaterial (X within 1.3x of Z default)",
          pauli['X'] <= 1.3 * base)
    check("observable basis immaterial (Y within 1.3x of Z default)",
          pauli['Y'] <= 1.3 * base)
    def eigs(k):
        # logger encodes ham_diag as "-".join(values) where a value may
        # itself be negative ("1--1" = [1,-1]); same grammar as
        # quanonet_tpu/infer.py:_parse_joined_floats (num ('-' num)*)
        vals, i = [], 0
        while i < len(k):
            m = re.match(r'-?\d+(?:\.\d+)?', k[i:])
            if not m:
                # an unparseable _Diag key must be a HARD failure, not a
                # silent exclusion that weakens the degeneracy gate
                raise SystemExit(
                    f"FAIL: unparseable ham_diag run-ID key '{k}' "
                    f"(at offset {i}) — the spectrum-degeneracy gate "
                    f"cannot classify this config")
            vals.append(float(m.group(0)))
            i += m.end() + 1        # skip the joining '-'
        return vals

    spread = [k for k in diag if len(set(eigs(k))) >= 3]
    degen = [k for k in diag if len(set(eigs(k))) in (1, 2)]
    check("spectra with >=3 distinct eigenvalues beat degenerate spectra "
          "(every pairwise ordering)",
          bool(spread) and bool(degen)
          and max(diag[k] for k in spread) < min(diag[k] for k in degen))
    if failures:
        print("FAILURES:", *failures, sep="\n  ")
        return 1
    print("hamiltonian trends reproduce ✓")
    return 0


def scaling_main():
    """Qubit-scaling-study trend checks (reference reproduce_scaling.sh:
    QuanONet Q2..Q8 at four Net shapes + DeepONet width grid, 5 seeds,
    docs/scaling_results.csv).

    The paper's claim: quality improves with qubit count at a fixed net
    shape — the 2^n latent dimension is the capacity lever.  Checks use
    Q2 > Q4 > Q7 (coarse monotone) per family rather than strict
    per-step monotonicity (adjacent steps sit within seed noise), and
    stop at Q7: the Q8 rows train under the fused engine at the fixed
    Q5-tuned budget and regress, which the scaling table documents.
    Also: the best Q7 QuanONet must be competitive (within 2x) with the
    best DeepONet in the same sweep."""
    import re
    fam = defaultdict(dict)   # net shape -> q -> mean rel-L2
    deeponet = []
    with open(PATH) as f:
        for row in csv.DictReader(f):
            cfg, v = row['config'], float(row['rel_l2_mean'])
            if '_DeepONet_' in cfg:
                deeponet.append(v)
                continue
            m = re.search(r'_(Net[\d-]+)_Q(\d+)_', cfg)
            if m:
                fam[m.group(1)][int(m.group(2))] = v
    print(f"scaling rows: {len(fam)} QuanONet families, "
          f"{len(deeponet)} DeepONet")
    if (len(fam) < 4 or len(deeponet) < 5
            or not any(7 in qs for qs in fam.values())):
        print("SKIP scaling checks (study not harvested yet)")
        return 0
    failures = []

    def check(name, ok):
        print(f"  {'PASS' if ok else 'FAIL'} {name}")
        if not ok:
            failures.append(name)

    for net in sorted(fam):
        qs = fam[net]
        check(f"quality improves with qubits ({net}: Q2 > Q4 > Q7)",
              all(q in qs for q in (2, 4, 7))
              and qs[2] > qs[4] > qs[7])
        check(f"Q7 at least 2.5x better than Q2 ({net})",
              all(q in qs for q in (2, 7)) and qs[2] >= 2.5 * qs[7])
    best_q7 = min(qs[7] for qs in fam.values() if 7 in qs)
    check("best Q7 QuanONet within 2x of best DeepONet",
          best_q7 <= 2.0 * min(deeponet))
    if failures:
        print("FAILURES:", *failures, sep="\n  ")
        return 1
    print("qubit-scaling trends reproduce ✓")
    return 0


def noise_main():
    """Noise-robustness-study trend checks (docs/noise_robustness.csv,
    scripts/noise_robustness_study.py): training THROUGH the deployment
    channel must beat ideal training under noisy inference, and only
    there."""
    rows = []
    with open(PATH) as f:
        for row in csv.DictReader(f):
            if row.get('zne'):
                continue               # ZNE rows checked separately below
            rows.append((row['trained'], float(row['eval_noise_p']),
                         float(row['rel_l2'])))

    def val(trained, p):
        return next((v for t, ep, v in rows
                     if t == trained and abs(ep - p) < 1e-12), None)
    ps = sorted({ep for t, ep, _ in rows if ep > 0})
    if not ps or val('ideal', 0.0) is None:
        print("SKIP noise checks (csv not populated)")
        return 0
    failures = []

    def check(name, ok):
        print(f"  {'PASS' if ok else 'FAIL'} {name}")
        if not ok:
            failures.append(name)

    def lt(a, b):
        # missing rows (partial CSV) must read as FAIL, not TypeError
        return a is not None and b is not None and a < b

    check("ideal-trained wins on the noise-free simulator",
          lt(val('ideal', 0.0), val('noise_aware', 0.0)))
    for p in ps:
        check(f"noise-trained wins under eval noise p={p:g}",
              lt(val('noise_aware', p), val('ideal', p)))
    ideal_curve = [val('ideal', p) for p in [0.0] + ps]
    check("ideal-trained degrades monotonically with noise",
          all(lt(a, b) for a, b in zip(ideal_curve, ideal_curve[1:])))
    if failures:
        print("FAILURES:", *failures, sep="\n  ")
        return 1
    print("noise-robustness trends reproduce ✓")
    return 0


def t1t2_main():
    """T1/T2 decoherence-study trend checks (docs/noise_robustness_t1t2.csv,
    scripts/noise_robustness_study.py --t1t2): same claims as noise_main
    but over the (damp_gamma, dephase_p) channel pairs."""
    rows = []
    with open(PATH) as f:
        for row in csv.DictReader(f):
            rows.append((row['trained'],
                         (float(row['eval_damp_gamma']),
                          float(row['eval_dephase_p'])),
                         float(row['rel_l2'])))

    def val(trained, ch):
        return next((v for t, c, v in rows if t == trained and c == ch),
                    None)
    chans = sorted({c for t, c, _ in rows if c != (0.0, 0.0)})
    if not chans or val('ideal', (0.0, 0.0)) is None:
        print("SKIP t1t2 checks (csv not populated)")
        return 0
    failures = []

    def check(name, ok):
        print(f"  {'PASS' if ok else 'FAIL'} {name}")
        if not ok:
            failures.append(name)

    def lt(a, b):
        # missing rows (partial CSV) must read as FAIL, not TypeError
        return a is not None and b is not None and a < b

    check("ideal-trained wins on the decoherence-free simulator",
          lt(val('ideal', (0.0, 0.0)), val('noise_aware', (0.0, 0.0))))
    for ch in chans:
        check(f"noise-trained wins under eval channel γ={ch[0]:g} "
              f"pφ={ch[1]:g}",
              lt(val('noise_aware', ch), val('ideal', ch)))
    ideal_curve = [val('ideal', c) for c in [(0.0, 0.0)] + chans]
    check("ideal-trained degrades monotonically with decoherence",
          all(lt(a, b) for a, b in zip(ideal_curve, ideal_curve[1:])))
    if failures:
        print("FAILURES:", *failures, sep="\n  ")
        return 1
    print("t1t2 decoherence trends reproduce ✓")
    return 0


def hardware_main():
    """Hardware-trainability study trend checks
    (docs/hardware_training.csv, scripts/hardware_training_study.py)."""
    by_seed = {}
    rows = {}
    with open(PATH) as f:
        for row in csv.DictReader(f):
            seed = int(row.get('seed') or 0)
            by_seed[(row['method'], seed)] = float(row['rel_l2'])
            if seed == 0:
                rows[row['method']] = float(row['rel_l2'])
    if 'autodiff' not in rows:
        print("SKIP hardware checks (csv not populated)")
        return 0
    failures = []

    def check(name, ok):
        print(f"  {'PASS' if ok else 'FAIL'} {name}")
        if not ok:
            failures.append(name)

    seeds = sorted({s for (m, s) in by_seed if m == 'shift'
                    and ('autodiff', s) in by_seed})
    for s in seeds:
        check(f"exact shift rule matches autodiff (10% rel, seed {s})",
              abs(by_seed[('shift', s)] - by_seed[('autodiff', s)])
              <= 0.10 * by_seed[('autodiff', s)])
    if 'shift@256' in rows and 'shift@8192' in rows:
        check("shift quality improves with shot budget",
              rows['shift@8192'] < rows['shift@256'])
        check("finite-shot shift approaches the exact rule",
              rows['shift@8192'] <= 1.5 * rows['shift'])
    if 'spsa' in rows and 'spsa_10x' in rows:
        check("SPSA improves with epoch budget",
              rows['spsa_10x'] < rows['spsa'])
    if 'spsa_10x' in rows and 'spsa@1024' in rows:
        check("SPSA is shot-noise tolerant (1024-shot ≈ exact, 10% rel)",
              abs(rows['spsa@1024'] - rows['spsa_10x'])
              <= 0.10 * rows['spsa_10x'])
    if failures:
        print("FAILURES:", *failures, sep="\n  ")
        return 1
    print("hardware-trainability trends reproduce ✓")
    return 0


if __name__ == '__main__':
    sys.exit(circuit_main() if 'circuit' in PATH
             else capacity_main() if 'capacity' in PATH
             else hamiltonian_main() if 'hamiltonian' in PATH
             else scaling_main() if 'scaling' in PATH
             else t1t2_main() if 't1t2' in PATH
             else noise_main() if 'noise' in PATH
             else hardware_main() if 'hardware' in PATH else main())
