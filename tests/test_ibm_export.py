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


def test_pauli_terms_simple_structure():
    """Big-endian string placement + affine params match the reference's
    _build_hamiltonian_op (quantum_circuits_qiskit.py:93-115)."""
    from quanonet_tpu.ibm_export import hamiltonian_pauli_terms
    terms, offset, coeff = hamiltonian_pauli_terms(3, (-5, 5), 'Z')
    assert terms == [('IIZ', 1.0), ('IZI', 1.0), ('ZII', 1.0)]
    o, c = simple_ham_params(3, -5, 5)
    assert (offset, coeff) == (o, c)
    for p in ('X', 'Y'):
        terms, _, _ = hamiltonian_pauli_terms(2, (-1, 3), p)
        assert terms == [('I' + p, 1.0), (p + 'I', 1.0)]
    with pytest.raises(ValueError, match='X|Y|Z'):
        hamiltonian_pauli_terms(2, (-5, 5), 'W')


def test_ham_diag_terms_reconstruct_diagonal():
    """Walsh–Hadamard export inverts exactly: evaluating the emitted
    Z-string terms on every computational basis state reproduces the
    original diagonal (the qiskit-free equivalent of diagonalizing the
    reference's SparsePauliOp, quantum_circuits_qiskit.py:117-134)."""
    from quanonet_tpu.ibm_export import hamiltonian_pauli_terms
    rng = np.random.RandomState(3)
    n = 3
    diag = rng.randn(2 ** n)
    terms, offset, coeff = hamiltonian_pauli_terms(n, ham_diag=diag)
    assert (offset, coeff) == (0.0, 1.0)
    rebuilt = np.zeros(2 ** n)
    for k in range(2 ** n):
        for string, c in terms:
            sign = 1.0
            for pos, ch in enumerate(string):
                q = n - 1 - pos            # big-endian convention
                if ch == 'Z' and (k >> q) & 1:
                    sign = -sign
            rebuilt[k] += c * sign
    np.testing.assert_allclose(rebuilt, diag, atol=1e-12)
    # sparse diag drops ~zero terms but keeps the identity term
    t2, _, _ = hamiltonian_pauli_terms(1, ham_diag=[2.0, 2.0])
    assert t2 == [('I', 2.0)]
    t3, _, _ = hamiltonian_pauli_terms(1, ham_diag=[0.0, 0.0])
    assert t3 == [('I', 0.0)]


@needs_ckpt
@pytest.mark.parametrize("pauli", ['X', 'Y'])
def test_xy_export_self_verifies_against_model(pauli):
    """X/Y-observable replay (reference ham_pauli ablation,
    quantum_circuits_ms.py:28-39): gate-level simulation of the exported
    circuit + the exported observable == the engine's own model output,
    checked BOTH through simulate_gate_list's direct <Σ P_i> path and
    through the independent Pauli-term estimator double."""
    from quanonet_tpu.ibm_export import (
        hamiltonian_pauli_terms, pauli_term_expectations,
    )
    raw = load_raw(CKPT)
    tw, bw, coeffs, bias = unpack_quanonet_weights(raw, [5, 1, 5, 1], 2)
    branch = np.linspace(0, 1, 10)
    trunk_pts = np.asarray([0.1, 0.8])
    ideal = ideal_predictions(raw, [5, 1, 5, 1], 2, branch, trunk_pts,
                              ham_pauli=pauli)
    terms, offset, coeff = hamiltonian_pauli_terms(2, (-5, 5), pauli)
    for k, t in enumerate(trunk_pts):
        n, ops = build_gate_list(branch, [t], tw, bw, coeffs)
        psum = simulate_gate_list(n, ops, ham_pauli=pauli)
        np.testing.assert_allclose(psum * coeff + offset + bias,
                                   ideal[k], atol=1e-4)
        est = pauli_term_expectations(n, ops, terms)
        np.testing.assert_allclose(est, psum, atol=1e-6)


@needs_ckpt
def test_ham_diag_export_self_verifies_against_model():
    """Explicit-diagonal observable: engine model output == direct
    <diag> replay == Walsh–Hadamard Pauli-term estimator double (pins
    the diag-index <-> qubit-bit convention end to end)."""
    from quanonet_tpu.ibm_export import (
        hamiltonian_pauli_terms, pauli_term_expectations,
    )
    raw = load_raw(CKPT)
    tw, bw, coeffs, bias = unpack_quanonet_weights(raw, [5, 1, 5, 1], 2)
    branch = np.cos(np.pi * np.linspace(0, 1, 10))
    diag = [1.5, -2.0, 0.25, 4.0]
    trunk_pts = np.asarray([0.0, 0.6])
    ideal = ideal_predictions(raw, [5, 1, 5, 1], 2, branch, trunk_pts,
                              ham_diag=diag)
    terms, offset, coeff = hamiltonian_pauli_terms(2, ham_diag=diag)
    for k, t in enumerate(trunk_pts):
        n, ops = build_gate_list(branch, [t], tw, bw, coeffs)
        hval = simulate_gate_list(n, ops, ham_diag=diag)
        np.testing.assert_allclose(hval + bias, ideal[k], atol=1e-4)
        est = pauli_term_expectations(n, ops, terms)
        np.testing.assert_allclose(est, hval, atol=1e-6)


GOLDEN_MANIFEST = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               'fixtures', 'golden_manifest_antideriv.json')


@needs_ckpt
def test_submission_manifest_golden():
    """Multi-pub submission assembly is pinned as a committed JSON golden:
    per-circuit QASM hashes, gate counts, observable terms, shot budget,
    and the classical postprocess (reference ibm_inference.py:269-276
    pub structure)."""
    import json
    from quanonet_tpu.ibm_export import submission_manifest, to_qasm2
    raw = load_raw(CKPT)
    tw, bw, coeffs, bias = unpack_quanonet_weights(raw, [5, 1, 5, 1], 2)
    branch = np.linspace(0, 1, 10)
    qasms, labels = [], []
    for t in (0.0, 0.5, 1.0):
        n, ops = build_gate_list(branch, [t], tw, bw, coeffs)
        qasms.append(to_qasm2(n, ops))
        labels.append(f"trunk={t}")
    manifest = submission_manifest(qasms, 2, (-5.0, 5.0), shots=10_000,
                                   bias=bias, labels=labels)
    assert manifest['postprocess']['bias'] == pytest.approx(bias)
    assert [p['gate_counts'] for p in manifest['pubs']] == [
        {'rx': 20, 'ry': 40, 'rz': 20, 'cx': 20}] * 3
    with open(GOLDEN_MANIFEST) as f:
        golden = json.load(f)
    assert manifest == golden


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
