"""
IBM deployment-path tests: weight unpacking layout, gate-list structure,
QASM emission, and the export's self-verification against the model.
"""
import os

import numpy as np
import pytest

from quanonet_tpu.checkpoint import load_raw
from quanonet_tpu.ibm_export import (
    build_gate_list, ideal_predictions, simulate_gate_list, to_qasm2,
    unpack_quanonet_weights,
)
from quanonet_tpu.ops.hamiltonian import simple_ham_params

CKPT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    'pretrained_weights/Antideriv/'
    'Antideriv_QuanONet_Net5-1-5-1_Q2_TF_S0.001_1000x100_Seed0/'
    'best_model.npz')
needs_ckpt = pytest.mark.skipif(not os.path.exists(CKPT),
                                reason="golden checkpoint missing")


@needs_ckpt
def test_unpack_layout():
    raw = load_raw(CKPT)
    tw, bw, coeffs, bias = unpack_quanonet_weights(raw, [5, 1, 5, 1], 2)
    assert tw.shape == (5, 1, 3, 2)
    assert bw.shape == (5, 1, 3, 2)
    assert coeffs.shape == (10, 2, 2)   # (layers, w/b, qubits)
    # trunk-first flat order (reference ibm_inference.py:162)
    np.testing.assert_array_equal(tw.reshape(-1),
                                  raw['QuanONet.weight'][:30])


@needs_ckpt
def test_gate_list_and_qasm():
    raw = load_raw(CKPT)
    tw, bw, coeffs, bias = unpack_quanonet_weights(raw, [5, 1, 5, 1], 2)
    branch = np.cos(np.pi * np.linspace(0, 1, 10))
    n, ops = build_gate_list(branch, [0.5], tw, bw, coeffs)
    assert n == 2
    # 10 blocks x (2 RX + 1 sublayer x (6 rots + 2 CNOT)) = 100 ops
    assert len(ops) == 10 * (2 + 6 + 2)
    kinds = {o[0] for o in ops}
    assert kinds == {'rx', 'ry', 'rz', 'cx'}

    qasm = to_qasm2(n, ops)
    assert qasm.startswith('OPENQASM 2.0;')
    assert 'qreg q[2];' in qasm
    assert qasm.count('\ncx ') == 20
    assert 'measure' not in qasm
    qasm_m = to_qasm2(n, ops, measure=True)
    assert qasm_m.count('measure') == 2


@needs_ckpt
def test_export_self_verifies_against_model():
    """Gate-level replay of the folded circuit == fused-engine model
    prediction (the strongest cross-check of the TF tiling fold)."""
    raw = load_raw(CKPT)
    tw, bw, coeffs, bias = unpack_quanonet_weights(raw, [5, 1, 5, 1], 2)
    offset, coeff = simple_ham_params(2, -5, 5)
    branch = np.linspace(0, 1, 10)
    trunk_pts = np.asarray([0.0, 0.33, 1.0])
    ideal = ideal_predictions(raw, [5, 1, 5, 1], 2, branch, trunk_pts)
    for k, t in enumerate(trunk_pts):
        n, ops = build_gate_list(branch, [t], tw, bw, coeffs)
        zsum = simulate_gate_list(n, ops)
        pred = zsum * coeff + offset + bias
        np.testing.assert_allclose(pred, ideal[k], atol=1e-4)
