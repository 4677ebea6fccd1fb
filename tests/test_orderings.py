"""The paper's trend claims stay locked in: every harvested study CSV
must keep passing its scripts/check_paper_orderings.py gate (reference
claims from reproduce_*.sh — see docs/BENCHMARKS.md per-study sections).

Runs the checker as a subprocess exactly as CI/users do; the script is
jax-free (csv/re only) so each mode costs milliseconds.
"""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CHECKER = os.path.join(REPO, 'scripts', 'check_paper_orderings.py')

STUDY_CSVS = [
    'benchmarks1_results.csv',       # model-family orderings
    'capacity_results.csv',          # capacity saturation, 2^n <-> p
    'circuit_results.csv',           # circuit-size trends, 5-seed parity
    'hamiltonian_results.csv',       # bound/observable/spectrum ablations
    'scaling_results.csv',           # qubit-scaling monotonicity
    'noise_robustness.csv',          # noise-aware training wins
    'noise_robustness_t1t2.csv',     # T1/T2 decoherence orderings
    'hardware_training.csv',         # shift/SPSA/finite-shot trends
]


@pytest.mark.parametrize('csv_name', STUDY_CSVS)
def test_study_trend_gate(csv_name):
    path = os.path.join(REPO, 'docs', csv_name)
    assert os.path.exists(path), f"harvested study CSV missing: {csv_name}"
    proc = subprocess.run([sys.executable, CHECKER, path],
                          capture_output=True, text=True, cwd=REPO)
    assert proc.returncode == 0, (
        f"{csv_name} trend gate failed:\n{proc.stdout}{proc.stderr}")
    # a silent SKIP (rows missing) must not masquerade as a pass for
    # studies we have fully harvested
    assert 'reproduce ✓' in proc.stdout, proc.stdout
