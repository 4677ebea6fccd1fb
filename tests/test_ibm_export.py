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


GOLDEN_QASM = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           'fixtures', 'golden_antideriv_t05.qasm')

_QASM_1Q = __import__('re').compile(
    r'^(rx|ry|rz)\((-?[\d.e+-]+)\) q\[(\d+)\];$')
_QASM_CX = __import__('re').compile(r'^cx q\[(\d+)\],q\[(\d+)\];$')


def _parse_qasm2(text):
    """Minimal OpenQASM 2.0 reader for the gate set this exporter emits.
    Stands in for qiskit (absent in this environment): anything the real
    toolchain would parse, this must parse identically."""
    n_wires, ops = None, []
    for line in text.strip().splitlines():
        if line.startswith('qreg'):
            n_wires = int(line.split('[')[1].split(']')[0])
            continue
        m = _QASM_1Q.match(line)
        if m:
            ops.append((m.group(1), int(m.group(3)), float(m.group(2))))
            continue
        m = _QASM_CX.match(line)
        if m:
            ops.append(('cx', int(m.group(1)), int(m.group(2))))
            continue
        if line.split()[0] not in ('OPENQASM', 'include', 'creg', 'measure'):
            raise ValueError(f"unparsed QASM line: {line!r}")
    return n_wires, ops


@needs_ckpt
def test_golden_qasm_fixture():
    """The emitted QASM2 text for the shipped Antideriv checkpoint at
    trunk=0.5 is pinned byte-for-byte (drift in angle folding, gate order,
    or float formatting breaks the committed fixture).  Mirrors the
    reference's real-submission path (reference ibm_inference.py:21-59)
    without needing qiskit."""
    raw = load_raw(CKPT)
    tw, bw, coeffs, bias = unpack_quanonet_weights(raw, [5, 1, 5, 1], 2)
    branch = np.linspace(0, 1, 10)
    n, ops = build_gate_list(branch, [0.5], tw, bw, coeffs)
    qasm = to_qasm2(n, ops)
    with open(GOLDEN_QASM) as f:
        assert qasm == f.read()


@needs_ckpt
def test_qasm_roundtrip_through_independent_parser():
    """to_qasm2 -> text -> parse -> re-simulate == original gate-list
    simulation to 1e-6 (the qiskit-parse/Statevector equivalence check of
    reference ibm_inference.py:205-213, with a local QASM2 reader standing
    in for qiskit)."""
    raw = load_raw(CKPT)
    tw, bw, coeffs, bias = unpack_quanonet_weights(raw, [5, 1, 5, 1], 2)
    branch = np.cos(np.pi * np.linspace(0, 1, 10))
    for t in (0.0, 0.7):
        n, ops = build_gate_list(branch, [t], tw, bw, coeffs)
        n2, ops2 = _parse_qasm2(to_qasm2(n, ops))
        assert n2 == n
        assert len(ops2) == len(ops)
        # structural contract: per block n RX + linear_depth*(3n rot + n cx)
        assert sum(1 for o in ops2 if o[0] == 'rx') == 10 * 2
        assert sum(1 for o in ops2 if o[0] == 'cx') == 10 * 2
        # CNOT ring direction: control=(i+1)%n, target=i
        cxs = [o for o in ops2 if o[0] == 'cx'][:2]
        assert cxs == [('cx', 1, 0), ('cx', 0, 1)]
        z1 = simulate_gate_list(n, ops)
        z2 = simulate_gate_list(n2, ops2)
        np.testing.assert_allclose(z2, z1, atol=1e-6)


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
