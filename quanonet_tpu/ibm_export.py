"""
IBM Quantum deployment path (reference ibm_inference.py:1-312).

The reference rebuilds the trained circuit in raw Qiskit with the
trainable-frequency affine map folded into the RX angles, runs an ideal
StatevectorEstimator, then optionally submits to a real QPU with
calibration-aware qubit routing.  Here the deployment artifact is built
WITHOUT qiskit (not installed in this environment):

* ``build_gate_list``     — the fully-resolved gate sequence per input
  point, angles folded (reference create_circuit:21-59, encode:33-36);
* ``to_qasm2``            — OpenQASM 2.0 text (consumable by qiskit /
  IBM Quantum / any QASM toolchain);
* ``simulate_gate_list``  — runs the exported sequence through the
  gate-by-gate engine: the export is SELF-VERIFYING against the model's
  own prediction;
* qiskit-gated extras (ideal estimator, least_busy + calibration-scored
  qubit routing, EstimatorV2 submission) activate when qiskit is present.
"""
import hashlib

import numpy as np

from quanonet_tpu.ops.hamiltonian import (
    simple_ham_params, walsh_hadamard_coeffs,
)


def unpack_quanonet_weights(raw, net_size, num_qubits):
    """Flat checkpoint -> per-layer structures (reference
    ibm_inference.py:159-173: trunk-first flat order)."""
    n_branch_layers, n_branch_hidden, n_trunk_layers, n_trunk_hidden = net_size
    w = np.asarray(raw['QuanONet.weight'], np.float64)
    trunk_count = n_trunk_layers * n_trunk_hidden * 3 * num_qubits
    branch_count = n_branch_layers * n_branch_hidden * 3 * num_qubits
    trunk_weights = w[:trunk_count].reshape(
        n_trunk_layers, n_trunk_hidden, 3, num_qubits)
    branch_weights = w[trunk_count:trunk_count + branch_count].reshape(
        n_branch_layers, n_branch_hidden, 3, num_qubits)
    t_w = np.asarray(raw['trunk_LinearLayer.Net2.weights']).reshape(
        n_trunk_layers, num_qubits)
    t_b = np.asarray(raw['trunk_LinearLayer.Net2.bias']).reshape(
        n_trunk_layers, num_qubits)
    b_w = np.asarray(raw['branch_LinearLayer.Net2.weights']).reshape(
        n_branch_layers, num_qubits)
    b_b = np.asarray(raw['branch_LinearLayer.Net2.bias']).reshape(
        n_branch_layers, num_qubits)
    coefficients = np.stack([np.concatenate([t_w, b_w], axis=0),
                             np.concatenate([t_b, b_b], axis=0)], axis=1)
    bias = float(np.asarray(raw['bias']).reshape(()))
    return trunk_weights, branch_weights, coefficients, bias


def build_gate_list(branch_inputs, trunk_inputs, trunk_weights,
                    branch_weights, coefficients):
    """Fully-resolved gate ops for one sample.

    Returns (n_wires, ops) with ops = [('rx'|'ry'|'rz', qubit, angle) or
    ('cx', control, target)].  Mirrors reference create_circuit:21-59:
    cyclic feature tiling per layer, affine fold angle = x*w + b, ansatz
    RY/RZ/RY + CNOT ring control=(i+1)%n -> target=i.
    """
    branch_inputs = np.asarray(branch_inputs, np.float64)
    trunk_inputs = np.asarray(trunk_inputs, np.float64)
    n_trunk_layers, n_trunk_hidden = trunk_weights.shape[:2]
    n_branch_layers, n_branch_hidden = branch_weights.shape[:2]
    n = trunk_weights.shape[-1]
    branch_size, trunk_size = len(branch_inputs), len(trunk_inputs)
    ops = []

    def entangle():
        for i in range(n):
            ops.append(('cx', (i + 1) % n, i))

    def ansatz(wl):
        for j in range(n):
            ops.append(('ry', j, float(wl[0][j])))
            ops.append(('rz', j, float(wl[1][j])))
            ops.append(('ry', j, float(wl[2][j])))

    def encode(coeffs, feats):
        for j in range(n):
            angle = feats[j] * float(coeffs[0][j]) + float(coeffs[1][j])
            ops.append(('rx', j, float(angle)))

    for i in range(n_trunk_layers):
        feats = [trunk_inputs[(i * n % trunk_size + j) % trunk_size]
                 for j in range(n)]
        encode(coefficients[i], feats)
        for h in range(n_trunk_hidden):
            ansatz(trunk_weights[i][h])
            entangle()
    for i in range(n_branch_layers):
        feats = [branch_inputs[(i * n % branch_size + j) % branch_size]
                 for j in range(n)]
        encode(coefficients[n_trunk_layers + i], feats)
        for h in range(n_branch_hidden):
            ansatz(branch_weights[i][h])
            entangle()
    return n, ops


def to_qasm2(n_wires, ops, measure=False):
    """OpenQASM 2.0 emission."""
    lines = ['OPENQASM 2.0;', 'include "qelib1.inc";',
             f'qreg q[{n_wires}];']
    if measure:
        lines.append(f'creg c[{n_wires}];')
    for op in ops:
        if op[0] == 'cx':
            lines.append(f'cx q[{op[1]}],q[{op[2]}];')
        else:
            lines.append(f'{op[0]}({op[2]!r}) q[{op[1]}];')
    if measure:
        lines += [f'measure q[{i}] -> c[{i}];' for i in range(n_wires)]
    return '\n'.join(lines) + '\n'


def final_state(n_wires, ops):
    """Run the exported gate sequence on the gate-by-gate engine and
    return the final statevector as a host-side complex128 array (index k
    <-> little-endian bit i = qubit i, the engine convention)."""
    import jax.numpy as jnp
    from quanonet_tpu.ops.hea import (
        _apply_ry, _apply_rz, _rx_single, _init_state,
    )

    sr, si = _init_state(1, 2 ** n_wires)
    for op in ops:
        if op[0] == 'rx':
            sr, si = _rx_single(sr, si, op[1],
                                jnp.asarray([op[2]], jnp.float32), n_wires)
        elif op[0] == 'ry':
            c = jnp.cos(jnp.float32(op[2]) / 2)
            s = jnp.sin(jnp.float32(op[2]) / 2)
            sr, si = _apply_ry(sr, si, op[1], c, s, n_wires)
        elif op[0] == 'rz':
            sr, si = _apply_rz(sr, si, op[1], jnp.float32(op[2]) / 2,
                               n_wires)
        elif op[0] == 'cx':
            c, t = op[1], op[2]
            dim = 2 ** n_wires
            k = np.arange(dim)
            perm = k ^ (((k >> c) & 1) << t)
            inv = np.empty_like(perm)
            inv[perm] = k
            sr = sr[:, inv]
            si = si[:, inv]
        else:
            raise ValueError(f"unknown op {op[0]}")
    return (np.asarray(sr, np.float64)
            + 1j * np.asarray(si, np.float64))[0]


def simulate_gate_list(n_wires, ops, ham_pauli='Z', ham_diag=None):
    """Self-verify the export: run the exported gate sequence and return
    the RAW observable value the estimator would report —
    <Σ P_i> for ham_pauli in {X, Y, Z} (reference ham_pauli ablation,
    quantum_circuits_ms.py:28-39), or <H> for an explicit diagonal
    ham_diag (quantum_circuits_qiskit.py:117-134).  Apply the classical
    affine (offset, coeff) from hamiltonian_pauli_terms afterwards."""
    from quanonet_tpu.ops.gates import z_signs

    psi = final_state(n_wires, ops)
    if ham_diag is not None:
        d = np.asarray(ham_diag, np.float64)
        if d.size != 2 ** n_wires:
            raise ValueError(f"ham_diag has {d.size} entries; expected "
                             f"2^{n_wires} = {2 ** n_wires}")
        return float((np.abs(psi) ** 2) @ d)
    if ham_pauli == 'Z':
        zs = z_signs(n_wires).sum(axis=1)
        return float((np.abs(psi) ** 2) @ zs)
    if ham_pauli not in ('X', 'Y'):
        raise ValueError(f"ham_pauli must be X|Y|Z, got {ham_pauli!r}")
    k = np.arange(2 ** n_wires)
    total = 0.0
    for i in range(n_wires):
        flipped = psi[k ^ (1 << i)]
        if ham_pauli == 'X':
            # <X_i> = Σ_k conj(ψ_k) ψ_{k^bit}
            total += float(np.real(np.conj(psi) @ flipped))
        else:
            # Y|0>=i|1>, Y|1>=-i|0>: (Yψ)_k = i·sign(bit_i(k))·ψ_{k^bit}
            sign = np.where((k >> i) & 1, 1.0, -1.0)
            total += float(np.real(np.conj(psi) @ (1j * sign * flipped)))
    return total


def hamiltonian_pauli_terms(num_qubits, ham_bound=(-5.0, 5.0),
                            ham_pauli='Z', ham_diag=None):
    """The observable half of a QPU submission: big-endian Pauli-string
    terms for qiskit's ``SparsePauliOp.from_list`` plus the classical
    affine postprocess, ``pred = evs·coeff + offset (+ bias)``.

    Matches the reference's _build_hamiltonian_op
    (quantum_circuits_qiskit.py:93-134): qubit i sits at string position
    n-1-i (qiskit big-endian).  Simple Hamiltonians (H = offset·I +
    c·Σ_i P_i, P = ham_pauli ∈ {X,Y,Z}, generate_simple_hamiltonian
    semantics) export unit-coefficient single-P terms with the affine
    applied classically — exactly how the reference submits
    (ibm_inference.py:195-213).  An explicit ham_diag exports its
    Walsh–Hadamard Z-string decomposition (terms carry the real
    coefficients; offset=0, coeff=1), dropping |c| < 1e-12 terms.

    Returns (terms, offset, coeff) with terms = [(pauli_str, coeff), ...].
    """
    n = num_qubits
    if ham_diag is not None:
        coeffs = walsh_hadamard_coeffs(ham_diag, n)
        terms = []
        for idx, c in enumerate(coeffs):
            if abs(c) < 1e-12:
                continue
            chars = ['I'] * n
            for q in range(n):
                if (idx >> q) & 1:
                    chars[n - 1 - q] = 'Z'
            terms.append((''.join(chars), float(c)))
        if not terms:
            terms = [('I' * n, 0.0)]
        return terms, 0.0, 1.0
    if ham_pauli not in ('X', 'Y', 'Z'):
        raise ValueError(f"ham_pauli must be X|Y|Z, got {ham_pauli!r}")
    offset, coeff = simple_ham_params(n, *ham_bound)
    terms = [('I' * (n - 1 - i) + ham_pauli + 'I' * i, 1.0)
             for i in range(n)]
    return terms, offset, coeff


def pauli_term_expectations(n_wires, ops, terms):
    """Independent estimator double: evaluate each big-endian Pauli-string
    term on the exported circuit's final state exactly as qiskit's
    EstimatorV2 would, and return Σ c·<term>.  Verifies the TERMS emitted
    by hamiltonian_pauli_terms (string convention included) without
    qiskit."""
    psi = final_state(n_wires, ops)
    k = np.arange(2 ** n_wires)
    total = 0.0
    for string, c in terms:
        if len(string) != n_wires:
            raise ValueError(f"term {string!r} has wrong length")
        phi = psi.copy()
        for pos, ch in enumerate(string):
            q = n_wires - 1 - pos    # big-endian: leftmost char = qubit n-1
            if ch == 'I':
                continue
            bit = (k >> q) & 1
            if ch == 'Z':
                phi = np.where(bit, -phi, phi)
            elif ch == 'X':
                phi = phi[k ^ (1 << q)]
            elif ch == 'Y':
                phi = 1j * np.where(bit, 1.0, -1.0) * phi[k ^ (1 << q)]
            else:
                raise ValueError(f"unknown Pauli {ch!r} in {string!r}")
        total += float(c) * float(np.real(np.conj(psi) @ phi))
    return total


def submission_manifest(qasm_strs, num_qubits, ham_bound=(-5.0, 5.0),
                        ham_pauli='Z', ham_diag=None, shots=10_000,
                        bias=0.0, labels=None):
    """Assemble the JSON-serializable hand-off artifact for a multi-pub
    EstimatorV2 submission from a qiskit-enabled machine: one pub per
    exported circuit, a shared observable (hamiltonian_pauli_terms), the
    shot budget, and the classical postprocess.  The structure mirrors
    what submit_to_ibm assembles live (one (circuit, [observable]) pub
    per QASM, reference ibm_inference.py:269-276)."""
    terms, offset, coeff = hamiltonian_pauli_terms(
        num_qubits, ham_bound, ham_pauli, ham_diag)
    pubs = []
    for idx, qasm in enumerate(qasm_strs):
        counts = {}
        for line in qasm.splitlines():
            head = line.split('(')[0].split()[0] if line.strip() else ''
            if head in ('rx', 'ry', 'rz', 'cx'):
                counts[head] = counts.get(head, 0) + 1
        pub = {'index': idx,
               'qasm_sha256': hashlib.sha256(qasm.encode()).hexdigest(),
               'gate_counts': counts}
        if labels is not None:
            pub['label'] = labels[idx]
        pubs.append(pub)
    return {
        'format': 'quanonet-ibm-submission/1',
        'num_qubits': int(num_qubits),
        'shots': int(shots),
        'observable': {'terms': [[s, float(c)] for s, c in terms],
                       'convention': 'qiskit big-endian'},
        'postprocess': {'formula': 'pred = evs*coeff + offset + bias',
                        'coeff': float(coeff), 'offset': float(offset),
                        'bias': float(bias)},
        'pubs': pubs,
    }


def ideal_predictions(raw, net_size, num_qubits, branch_vec, trunk_points,
                      ham_bound=(-5.0, 5.0), ham_pauli='Z', ham_diag=None):
    """Ideal (noise-free) predictions for all trunk points using the fused
    engine — the analog of the reference's StatevectorEstimator step
    (ibm_inference.py:205-213).  Supports the full observable surface
    (ham_pauli X/Y ablation, explicit ham_diag)."""
    import jax
    import jax.numpy as jnp
    from quanonet_tpu.checkpoint import quantum_params_from_raw
    from quanonet_tpu.models import QuanONet

    params = jax.tree_util.tree_map(
        jnp.asarray,
        quantum_params_from_raw(raw, 'QuanONet', tuple(net_size),
                                num_qubits, True))
    model = QuanONet(num_qubits=num_qubits,
                     branch_input_size=len(branch_vec),
                     trunk_input_size=1, net_size=tuple(net_size),
                     if_trainable_freq=True, ham_bound=tuple(ham_bound),
                     ham_pauli=ham_pauli,
                     ham_diag=(tuple(float(d) for d in ham_diag)
                               if ham_diag is not None else None))
    n_pts = len(trunk_points)
    b = jnp.asarray(np.tile(branch_vec, (n_pts, 1)).astype(np.float32))
    t = jnp.asarray(np.asarray(trunk_points, np.float32).reshape(-1, 1))
    return np.asarray(model.apply(params, b, t))[:, 0]


def shot_predictions(raw, net_size, num_qubits, branch_vec, trunk_points,
                     ham_bound=(-5.0, 5.0), shots=10_000, seed=0):
    """Finite-shot predictions + analytic shot-noise std per point — the
    decoherence-free emulation of the reference's 10,000-shot EstimatorV2
    job (ibm_inference.py:269-276), so the shot-noise floor of a planned
    QPU submission is known BEFORE burning QPU time.

    Returns (sampled_preds, shot_std), both (n_points,) float64.
    """
    import jax
    import jax.numpy as jnp
    from quanonet_tpu.checkpoint import quantum_params_from_raw
    from quanonet_tpu.models import QuanONet
    from quanonet_tpu.ops.hamiltonian import simple_ham_diag
    from quanonet_tpu.ops.hea import hea_forward_pair, quanonet_spec
    from quanonet_tpu.ops.sampling import shot_noise_std

    params = jax.tree_util.tree_map(
        jnp.asarray,
        quantum_params_from_raw(raw, 'QuanONet', tuple(net_size),
                                num_qubits, True))
    n_pts = len(trunk_points)
    b = jnp.asarray(np.tile(branch_vec, (n_pts, 1)).astype(np.float32))
    t = jnp.asarray(np.asarray(trunk_points, np.float32).reshape(-1, 1))

    # the sampled forward, via the model's shots attribute + rng
    model = QuanONet(num_qubits=num_qubits,
                     branch_input_size=len(branch_vec),
                     trunk_input_size=1, net_size=tuple(net_size),
                     if_trainable_freq=True, ham_bound=tuple(ham_bound),
                     shots=int(shots))
    key = jax.random.PRNGKey(seed)
    sampled = np.asarray(model.apply(params, b, t,
                                     rngs={'shots': key}))[:, 0]

    # analytic std needs the pre-measurement state: run the model's own
    # encoder submodules on their param sub-trees, then the engine
    from quanonet_tpu.models.layers import TrainableFreq
    diag = jnp.asarray(simple_ham_diag(num_qubits, *ham_bound))
    bd, _, td, _ = tuple(net_size)
    p = params['params']
    spec = quanonet_spec(num_qubits, tuple(net_size))

    def state_std(b_, t_):
        trunk_enc = TrainableFreq(td * num_qubits).apply(
            {'params': p['trunk_freq']}, t_)
        branch_enc = TrainableFreq(bd * num_qubits).apply(
            {'params': p['branch_freq']}, b_)
        x = jnp.concatenate([trunk_enc, branch_enc], axis=1)
        sr, si = hea_forward_pair(spec, p['ansatz'], x)
        return shot_noise_std(sr, si, diag, int(shots))[:, 0]

    std = np.asarray(jax.jit(state_std)(b, t))
    return sampled.astype(np.float64), std.astype(np.float64)


def noisy_predictions(raw, net_size, num_qubits, branch_vec, trunk_points,
                      noise_p, ham_bound=(-5.0, 5.0), readout_p=0.0,
                      n_traj=64, zne_scales=None, seed=0,
                      damp_gamma=None, dephase_p=None):
    """Predictions under the calibrated depolarizing + readout channel
    (ops/noise.py) — the decoherence floor of a planned QPU job, optionally
    zero-noise-extrapolated (ops/mitigation.py, ``zne_scales=(1,2,3)``).
    Derive ``noise_p`` from backend calibration via
    ops.noise.noise_p_from_calibration(spec, gate_error_2q), and
    ``damp_gamma``/``dephase_p`` (T1/T2 decoherence per block) via
    ops.noise.channel_params_from_t1t2(block_time_us, t1_us, t2_us).

    Returns (n_points,) float64.  Complements shot_predictions: together
    they predict the full hardware error budget before submission.
    """
    import jax
    import jax.numpy as jnp
    from quanonet_tpu.checkpoint import quantum_params_from_raw
    from quanonet_tpu.models import QuanONet

    params = jax.tree_util.tree_map(
        jnp.asarray,
        quantum_params_from_raw(raw, 'QuanONet', tuple(net_size),
                                num_qubits, True))
    model = QuanONet(num_qubits=num_qubits,
                     branch_input_size=len(branch_vec),
                     trunk_input_size=1, net_size=tuple(net_size),
                     if_trainable_freq=True, ham_bound=tuple(ham_bound),
                     noise_p=float(noise_p), noise_traj=int(n_traj),
                     readout_p=float(readout_p),
                     zne_scales=(tuple(zne_scales) if zne_scales
                                 else None),
                     damp_gamma=(float(damp_gamma)
                                 if damp_gamma is not None else None),
                     dephase_p=(float(dephase_p)
                                if dephase_p is not None else None))
    n_pts = len(trunk_points)
    b = jnp.asarray(np.tile(branch_vec, (n_pts, 1)).astype(np.float32))
    t = jnp.asarray(np.asarray(trunk_points, np.float32).reshape(-1, 1))
    out = model.apply(params, b, t, rngs={'noise': jax.random.PRNGKey(seed)})
    return np.asarray(out)[:, 0].astype(np.float64)


# ── qiskit-gated extras ──────────────────────────────────────────────────────

def qiskit_available() -> bool:
    try:
        import qiskit  # noqa: F401
        return True
    except ImportError:
        return False


def profile_hardware(backend):
    """Calibration-aware qubit-pair scoring (reference
    ibm_inference.py:68-118): score = 2q-gate error + readout errors;
    reports T1/T2.  Requires a qiskit backend object."""
    props = backend.properties()
    conf = backend.configuration()
    basis_gates = conf.basis_gates
    gate_name = 'ecr' if 'ecr' in basis_gates else (
        'cz' if 'cz' in basis_gates else 'cx')

    scored = []
    seen = set()
    for q1, q2 in conf.coupling_map:
        key = tuple(sorted((q1, q2)))
        if key in seen:
            continue
        seen.add(key)
        try:
            gp = (props.gate_property(gate_name, [q1, q2])
                  or props.gate_property(gate_name, [q2, q1]))
            if not gp or 'gate_error' not in gp:
                continue
            gate_err = gp['gate_error'][0]
            ro1 = props.qubit_property(q1, 'readout_error')[0]
            ro2 = props.qubit_property(q2, 'readout_error')[0]
            t1 = (props.qubit_property(q1, 'T1')[0]
                  + props.qubit_property(q2, 'T1')[0]) / 2 * 1e6
            t2 = (props.qubit_property(q1, 'T2')[0]
                  + props.qubit_property(q2, 'T2')[0]) / 2 * 1e6
            scored.append({'pair': [q1, q2],
                           'score': gate_err + ro1 + ro2,
                           'gate_err': gate_err,
                           'ro_avg': (ro1 + ro2) / 2,
                           't1_avg': t1, 't2_avg': t2})
        except Exception:
            continue
    scored.sort(key=lambda s: s['score'])
    best = scored[0]
    print(f"Recommended Best Pair : {best['pair']}")
    print(f"  -> Avg T1 Time      : {best['t1_avg']:.1f} µs")
    print(f"  -> Avg T2 Time      : {best['t2_avg']:.1f} µs")
    print(f"  -> Gate Error       : {best['gate_err']:.4%}")
    print(f"  -> Avg Readout Error: {best['ro_avg']:.4%}")
    return best['pair']


def submit_to_ibm(qasm_strs, num_qubits, ham_bound, shots=10_000,
                  min_num_qubits=None, ham_pauli='Z', ham_diag=None):
    """Submit exported circuits to the least-busy IBM backend with
    calibration-aware initial layout (reference ibm_inference.py:244-276).
    The observable supports the full Hamiltonian surface (Z/X/Y simple
    bounds, explicit ham_diag) via hamiltonian_pauli_terms.
    Requires qiskit + qiskit-ibm-runtime + QISKIT_IBM_TOKEN."""
    if not qiskit_available():
        raise ImportError(
            "qiskit is not installed in this environment; the exported "
            ".qasm files are the hand-off artifact — submit them from a "
            "qiskit-enabled machine.")
    import os
    from qiskit import QuantumCircuit, transpile
    from qiskit.quantum_info import SparsePauliOp
    from qiskit_ibm_runtime import EstimatorV2, QiskitRuntimeService

    token = os.getenv("QISKIT_IBM_TOKEN")
    service = QiskitRuntimeService(channel="ibm_quantum_platform",
                                   token=token)
    backend = service.least_busy(
        min_num_qubits=min_num_qubits or num_qubits + 1)
    layout = profile_hardware(backend)[:num_qubits]
    terms, offset, coeff = hamiltonian_pauli_terms(
        num_qubits, ham_bound, ham_pauli, ham_diag)
    ham = SparsePauliOp.from_list(terms)
    pubs = []
    for qasm in qasm_strs:
        qc = QuantumCircuit.from_qasm_str(qasm)
        isa = transpile(qc, backend=backend, optimization_level=3,
                        initial_layout=layout)
        pubs.append((isa, [ham.apply_layout(isa.layout)]))
    estimator = EstimatorV2(mode=backend)
    estimator.options.default_shots = shots
    job = estimator.run(pubs)
    print(f"Submitted job: {job.job_id()}")
    return job, offset, coeff


def fetch_ibm_job(job_id):
    """Fetch an existing IBM Quantum job's expectation values
    (reference ibm_inference.py:223-243).  Returns (evs, backend_name)
    when the job is DONE, else (None, status).  Requires qiskit-ibm-
    runtime + QISKIT_IBM_TOKEN."""
    if not qiskit_available():
        raise ImportError(
            "qiskit is not installed in this environment; fetch the job "
            "from a qiskit-enabled machine "
            "(concatenate r.data.evs over QiskitRuntimeService()"
            ".job(id).result()).")
    import os
    import numpy as _np
    from qiskit_ibm_runtime import QiskitRuntimeService

    token = os.getenv("QISKIT_IBM_TOKEN")
    service = QiskitRuntimeService(channel="ibm_quantum_platform",
                                   token=token)
    job = service.job(job_id)
    status = str(job.status())
    if status != "DONE":
        return None, status
    backend_name = job.backend().name if job.backend() else "Unknown"
    # submit_to_ibm runs ONE pub per exported circuit (the reference's
    # ibm_inference.py:223-243 uses a single parameterized pub instead) —
    # gather every pub's expectation values, not just pub 0's.
    evs = _np.concatenate(
        [_np.atleast_1d(_np.asarray(r.data.evs)) for r in job.result()])
    return evs, backend_name
