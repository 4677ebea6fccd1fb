"""Contract-double tests for the qiskit-gated QPU half of ibm_export.

qiskit cannot be installed in this environment (zero network egress, no
pip installs), so the live submission path (reference
ibm_inference.py:223-276) would otherwise never execute.  These tests
stand in a minimal qiskit / qiskit_ibm_runtime API double — faithful to
the attribute/return shapes the real toolchain exposes — so the
submission LOGIC runs in CI: calibration-aware pair scoring and dedup
(profile_hardware), per-circuit pub assembly + shot options + layout
threading (submit_to_ibm), and multi-pub result concatenation
(fetch_ibm_job).
"""
import sys
import types

import numpy as np
import pytest

from quanonet_tpu import ibm_export
from quanonet_tpu.ops.hamiltonian import simple_ham_params


# ---------------------------------------------------------------------------
# backend double (the object surface profile_hardware reads; shapes match
# qiskit BackendV1 properties()/configuration())

class _Props:
    """gate_property/qubit_property return (value, timestamp) tuples,
    exactly like qiskit's BackendProperties accessors."""

    def __init__(self, gate_errs, readout, t1, t2):
        self._gate_errs = gate_errs          # {(q1, q2): err}
        self._ro, self._t1, self._t2 = readout, t1, t2

    def gate_property(self, gate_name, pair):
        err = self._gate_errs.get(tuple(pair))
        return None if err is None else {'gate_error': (err, 'ts')}

    def qubit_property(self, q, name):
        table = {'readout_error': self._ro, 'T1': self._t1, 'T2': self._t2}
        return (table[name][q], 'ts')


class _Conf:
    def __init__(self, coupling_map, basis_gates):
        self.coupling_map = coupling_map
        self.basis_gates = basis_gates


class _Backend:
    def __init__(self, props, conf):
        self._props, self._conf = props, conf

    def properties(self):
        return self._props

    def configuration(self):
        return self._conf


def _three_qubit_backend():
    """Line 0-1-2 with pair (1,2) clearly best: the coupling map lists
    both directions of (0,1) to exercise the dedup, and T1/T2 are in
    seconds (profile_hardware reports µs)."""
    gate_errs = {(0, 1): 0.02, (1, 0): 0.02, (1, 2): 0.001}
    readout = [0.03, 0.01, 0.01]
    t1 = [100e-6, 120e-6, 140e-6]
    t2 = [80e-6, 90e-6, 110e-6]
    conf = _Conf(coupling_map=[[0, 1], [1, 0], [1, 2]],
                 basis_gates=['ecr', 'rz', 'sx', 'x'])
    return _Backend(_Props(gate_errs, readout, t1, t2), conf)


def test_profile_hardware_scores_and_dedups(capsys):
    best = ibm_export.profile_hardware(_three_qubit_backend())
    # (1,2): 0.001 + 0.01 + 0.01 = 0.021 beats (0,1): 0.02 + 0.03 + 0.01
    assert best == [1, 2]
    out = capsys.readouterr().out
    assert 'Best Pair' in out and '130.0' in out   # avg T1 of q1,q2 in µs


def test_profile_hardware_falls_back_through_basis_gates():
    # no 'ecr' -> 'cz' -> 'cx' ladder: only a cx entry exists, so a
    # basis of ['cx'] must still find it
    b = _three_qubit_backend()
    b._conf.basis_gates = ['cx', 'rz']
    assert ibm_export.profile_hardware(b) == [1, 2]


# ---------------------------------------------------------------------------
# module doubles for `import qiskit` / `from qiskit import ...`

class _QC:
    def __init__(self, qasm):
        self.qasm = qasm

    @classmethod
    def from_qasm_str(cls, s):
        return cls(s)


class _ISA:
    def __init__(self, qc, layout):
        self.source = qc
        self.layout = ('layout', tuple(layout))


class _SparsePauliOp:
    def __init__(self, terms, num_qubits):
        self.terms, self.num_qubits = terms, num_qubits

    @classmethod
    def from_sparse_list(cls, terms, num_qubits):
        return cls(terms, num_qubits)

    @classmethod
    def from_list(cls, terms):
        return cls(terms, len(terms[0][0]))

    def apply_layout(self, layout):
        return ('ham@', layout, self.num_qubits)


class _Job:
    def __init__(self, job_id='job-123'):
        self._id = job_id

    def job_id(self):
        return self._id


class _Estimator:
    instances = []

    def __init__(self, mode):
        self.mode = mode
        self.options = types.SimpleNamespace(default_shots=None)
        self.ran = None
        _Estimator.instances.append(self)

    def run(self, pubs):
        self.ran = pubs
        return _Job()


class _Service:
    def __init__(self, channel=None, token=None, backend=None, job=None):
        self.channel, self.token = channel, token
        self._backend, self._job = backend, job
        self.least_busy_kwargs = None

    def least_busy(self, **kw):
        self.least_busy_kwargs = kw
        return self._backend

    def job(self, job_id):
        return self._job


def _install_stubs(monkeypatch, backend, job=None):
    transpile_calls = []

    def transpile(qc, backend=None, optimization_level=None,
                  initial_layout=None):
        transpile_calls.append(dict(backend=backend,
                                    optimization_level=optimization_level,
                                    initial_layout=list(initial_layout)))
        return _ISA(qc, initial_layout)

    qiskit = types.ModuleType('qiskit')
    qiskit.QuantumCircuit = _QC
    qiskit.transpile = transpile
    qi = types.ModuleType('qiskit.quantum_info')
    qi.SparsePauliOp = _SparsePauliOp
    qiskit.quantum_info = qi

    runtime = types.ModuleType('qiskit_ibm_runtime')
    service = _Service(backend=backend, job=job)
    runtime.QiskitRuntimeService = lambda channel=None, token=None: service
    runtime.EstimatorV2 = _Estimator

    monkeypatch.setitem(sys.modules, 'qiskit', qiskit)
    monkeypatch.setitem(sys.modules, 'qiskit.quantum_info', qi)
    monkeypatch.setitem(sys.modules, 'qiskit_ibm_runtime', runtime)
    return service, transpile_calls


def test_submit_to_ibm_assembles_one_pub_per_circuit(monkeypatch):
    _Estimator.instances.clear()
    backend = _three_qubit_backend()
    service, transpile_calls = _install_stubs(monkeypatch, backend)

    qasms = [ibm_export.to_qasm2(2, [('rx', 0, 0.3), ('cx', 1, 0)]),
             ibm_export.to_qasm2(2, [('ry', 1, -1.2)])]
    job, offset, coeff = ibm_export.submit_to_ibm(
        qasms, num_qubits=2, ham_bound=(-5, 5), shots=4096)

    assert job.job_id() == 'job-123'
    # Hamiltonian affine params match the engine's own convention
    o, c = simple_ham_params(2, -5, 5)
    assert (offset, coeff) == (o, c)
    # least_busy asked for headroom: num_qubits + 1
    assert service.least_busy_kwargs == {'min_num_qubits': 3}
    # calibration-scored layout threaded into EVERY transpile call
    assert [t['initial_layout'] for t in transpile_calls] == [[1, 2], [1, 2]]
    assert all(t['optimization_level'] == 3 for t in transpile_calls)
    est = _Estimator.instances[-1]
    assert est.options.default_shots == 4096
    # one pub per exported circuit: (isa, [ham.apply_layout(isa.layout)])
    assert len(est.ran) == len(qasms)
    for (isa, obs), qasm in zip(est.ran, qasms):
        assert isa.source.qasm == qasm
        assert obs == [('ham@', isa.layout, 2)]


def test_submit_to_ibm_threads_xy_and_hamdiag_observables(monkeypatch):
    """The full Hamiltonian surface reaches the pub assembly: X-basis
    simple bounds and an explicit ham_diag produce the same SparsePauliOp
    terms hamiltonian_pauli_terms emits (big-endian convention)."""
    _Estimator.instances.clear()
    service, _ = _install_stubs(monkeypatch, _three_qubit_backend())
    qasm = ibm_export.to_qasm2(2, [('rx', 0, 0.3)])

    job, offset, coeff = ibm_export.submit_to_ibm(
        [qasm], num_qubits=2, ham_bound=(-3, 3), ham_pauli='X')
    o, c = simple_ham_params(2, -3, 3)
    assert (offset, coeff) == (o, c)
    # the pub's observable went through from_list(terms) + apply_layout
    assert _Estimator.instances[-1].ran[0][1][0][0] == 'ham@'
    terms, _, _ = ibm_export.hamiltonian_pauli_terms(2, (-3, 3), 'X')
    assert terms == [('IX', 1.0), ('XI', 1.0)]

    _Estimator.instances.clear()
    diag = [2.0, -1.0, 0.5, 3.0]
    job, offset, coeff = ibm_export.submit_to_ibm(
        [qasm], num_qubits=2, ham_bound=(-5, 5), ham_diag=diag)
    assert (offset, coeff) == (0.0, 1.0)   # diag evs ARE <H>
    terms, _, _ = ibm_export.hamiltonian_pauli_terms(2, ham_diag=diag)
    # WH of [2,-1,.5,3]: II=1.125, IZ(q0)=.125, ZI(q1)=-.625, ZZ=1.375
    assert dict(terms) == pytest.approx(
        {'II': 1.125, 'IZ': 0.125, 'ZI': -0.625, 'ZZ': 1.375})


def test_submit_to_ibm_without_qiskit_raises(monkeypatch):
    for mod in ('qiskit', 'qiskit.quantum_info', 'qiskit_ibm_runtime'):
        monkeypatch.delitem(sys.modules, mod, raising=False)
    if ibm_export.qiskit_available():   # real qiskit present: gate is moot
        pytest.skip('real qiskit installed')
    with pytest.raises(ImportError, match='hand-off artifact'):
        ibm_export.submit_to_ibm(['OPENQASM 2.0;'], 2, (-5, 5))


def test_fetch_ibm_job_concatenates_all_pub_results(monkeypatch):
    class _PubResult:
        def __init__(self, evs):
            self.data = types.SimpleNamespace(evs=np.asarray(evs))

    class _DoneJob:
        def status(self):
            return 'DONE'

        def backend(self):
            return types.SimpleNamespace(name='fake_torino')

        def result(self):
            return [_PubResult([0.1, 0.2]), _PubResult(0.3)]

    _install_stubs(monkeypatch, _three_qubit_backend(), job=_DoneJob())
    evs, name = ibm_export.fetch_ibm_job('job-123')
    np.testing.assert_allclose(evs, [0.1, 0.2, 0.3])
    assert name == 'fake_torino'


def test_fetch_ibm_job_pending_returns_status(monkeypatch):
    class _PendingJob:
        def status(self):
            return 'QUEUED'

    _install_stubs(monkeypatch, _three_qubit_backend(), job=_PendingJob())
    evs, status = ibm_export.fetch_ibm_job('job-123')
    assert evs is None and status == 'QUEUED'
