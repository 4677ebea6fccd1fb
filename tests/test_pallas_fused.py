"""
pfused engine (ops/pallas_fused.py): the fused-group VMEM chain kernel.

Interpret-mode (CPU) equivalence against the XLA fused engine — which is
itself verified against the gates oracle in tests/test_fused_gates.py —
covering the hand-written VJP, the multi-tile batch grid with its
cross-tile cotangent accumulation, odd-batch padding, hi in {2, 4, 8},
and encoding-only (linear_depth 0) blocks.  Plus an exactness check of
the GF(2)-linear ring decomposition the kernel's permutation matmuls are
built from.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from unittest import mock

from quanonet_tpu.ops import pallas_fused as pf
from quanonet_tpu.ops.fused_gates import forward_fused
from quanonet_tpu.ops.gates import (
    cnot_ring_inverse_permutation,
    cnot_ring_permutation,
)
from quanonet_tpu.ops.hamiltonian import simple_ham_diag
from quanonet_tpu.ops.hea import HEASpec, hea_expectation, quanonet_spec


def _case(n, net, batch, seed=1, spec=None):
    spec = spec or quanonet_spec(n, net)
    rng = np.random.RandomState(seed)
    w = jnp.asarray(rng.uniform(-np.pi, np.pi,
                                spec.weight_shape()).astype(np.float32))
    x = jnp.asarray(rng.uniform(-2, 2,
                                (batch, spec.total_encode)).astype(np.float32))
    diag = jnp.asarray(simple_ham_diag(n, -5, 5))
    return spec, w, x, diag


def _compare(spec, w, x, diag, atol=5e-5):
    def loss_of(fwd):
        def f(w_, x_):
            a, b = fwd(spec, w_, x_)
            return jnp.sum(((a * a + b * b) @ diag) ** 2)
        return f

    l1, (gw1, gx1) = jax.value_and_grad(
        loss_of(forward_fused), argnums=(0, 1))(w, x)
    l2, (gw2, gx2) = jax.value_and_grad(
        loss_of(pf.forward_pfused), argnums=(0, 1))(w, x)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2), atol=atol)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2), atol=atol)


def test_ring_decomposition_exact():
    """The masked one-hot decomposition reproduces the gather exactly
    (forward map and its transpose), and needs only a handful of mats."""
    for n in (8, 9, 10, 11, 12, 13):
        for inverse, idx in ((False, cnot_ring_inverse_permutation(n)),
                             (True, cnot_ring_permutation(n))):
            plan, mats = pf._ring_decomp(n, inverse)
            hi = 2 ** (n - 7)
            s = np.random.RandomState(0).randn(3, 2 ** n).astype(np.float32)
            want = s[:, idx]
            got = np.zeros_like(s).reshape(3, hi, 128)
            sv = s.reshape(3, hi, 128)
            for h, entry in enumerate(plan):
                for src_h, mi in entry:
                    got[:, h] += sv[:, src_h] @ mats[mi]
            assert np.array_equal(got.reshape(3, -1), want)
            assert len(mats) <= 4


def test_q8_fwd_and_grad_matches_fused():
    _compare(*_case(8, (3, 2, 2, 1), 5))


def test_q10_hi8_matches_fused():
    _compare(*_case(10, (2, 2, 2, 1), 4))


def test_multi_tile_grid_accumulates():
    """Force bt=8 so the batch spans 3 grid tiles (with padding): the
    cross-tile unitary-cotangent accumulation must be exact."""
    spec, w, x, diag = _case(8, (3, 2, 2, 1), 20)
    with mock.patch.object(pf, '_pick_bt', lambda *a, **k: 8):
        _compare(spec, w, x, diag)


def test_odd_batch_padding():
    _compare(*_case(9, (2, 1, 2, 2), 7))


def test_encode_only_blocks():
    """Blocks with linear_depth 0 take the H-D-H path in-kernel."""
    spec = HEASpec(8, ((8, 1), (8, 0), (8, 2), (8, 0)))
    _compare(*_case(8, None, 5, spec=spec))


def test_engine_dispatch():
    spec, w, x, diag = _case(8, (2, 1, 1, 1), 4)
    out = hea_expectation(spec, w, x, diag=diag, engine='pfused')
    ref = hea_expectation(spec, w, x, diag=diag, engine='fused')
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_out_of_range_falls_back():
    """Q17 exceeds MAX_QUBITS: forward_pfused must route to the XLA
    fused path rather than build an unsupported kernel."""
    spec, w, x, diag = _case(17, (1, 1, 1, 1), 2)
    assert not pf.pfused_applicable(spec)
    out = hea_expectation(spec, w, x, diag=diag, engine='pfused')
    ref = hea_expectation(spec, w, x, diag=diag, engine='fused')
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_train_above_q14_raises_clear_error():
    """Q15-16 are FORWARD-only in the pfused kernel (the residual-saving
    backward exceeds scoped VMEM, round-5 probe): differentiating must
    raise the clear engine='fused' pointer, not an opaque Mosaic
    failure."""
    spec, w, x, diag = _case(15, (1, 1, 1, 1), 2)
    assert pf.pfused_applicable(spec)
    with pytest.raises(ValueError, match="fused"):
        jax.grad(lambda w_: jnp.sum(
            pf.hea_expectation_pfused(spec, w_, x, diag)))(w)


# ── butterfly high-group path (Q12+, ops/pallas_fused.py bfly mode) ──────────

def test_q12_bfly_fwd_and_grad_matches_fused():
    """Q12 (hi=32) runs the ⊗-factorized butterfly high group + class-
    stacked ring; fwd and the hand-written VJP (incl. the per-qubit 2x2
    cotangents threaded back through build_high_rot2x2) must match the
    XLA fused engine."""
    spec, w, x, diag = _case(12, (1, 1, 1, 1), 3)
    assert pf._bfly_mode(12) and pf.pfused_applicable(spec)
    _compare(spec, w, x, diag, atol=2e-4)


def test_q13_bfly_matches_fused():
    spec, w, x, diag = _case(13, (1, 1, 1, 1), 2)
    _compare(spec, w, x, diag, atol=2e-4)


@pytest.mark.skipif(__import__('os').environ.get('QON_SLOW') != '1',
                    reason="hi=128 interpret-mode run costs ~10 min on the "
                           "1-core box; run with QON_SLOW=1 (green this "
                           "round) — the on-chip compare_engines 'Q14 "
                           "fused≡pfused (butterfly)' gate covers the "
                           "kernel every round")
def test_q14_bfly_matches_fused():
    """Q14 (hi=128) — the round-5 butterfly extension: the per-qubit
    2x2 rotations now span 7 high qubits; fwd + hand-written VJP must
    match the XLA fused engine."""
    spec, w, x, diag = _case(14, (1, 1, 1, 1), 2)
    assert pf.pfused_applicable(spec)
    _compare(spec, w, x, diag, atol=4e-4)


def test_q12_encode_only_blocks_bfly():
    """linear_depth-0 blocks exercise the butterfly Hadamard H-D-H path."""
    spec = HEASpec(12, ((12, 1), (12, 0), (12, 1)))
    _compare(*_case(12, None, 2, spec=spec), atol=2e-4)


def test_bfly_forced_matches_dense_fma_path(monkeypatch):
    """PFUSED_BFLY=1 at Q9 (hi=4): the butterfly path must agree with
    the default dense hi^2 FMA path bit-for-bit-level (same engine
    contract, different in-kernel layout)."""
    spec, w, x, diag = _case(9, (2, 1, 2, 1), 4)
    monkeypatch.setenv('PFUSED_BFLY', '1')
    pf._make_chain.cache_clear()
    try:
        assert pf._bfly_mode(9)
        _compare(spec, w, x, diag)
    finally:
        pf._make_chain.cache_clear()


def test_q12_multi_tile_accumulation():
    """Multiple grid tiles at Q12: cross-tile accumulation of the
    (n_sub, nh, 4) butterfly cotangents must be exact."""
    spec, w, x, diag = _case(12, (1, 1, 1, 1), 20)
    with mock.patch.object(pf, '_pick_bt', lambda *a, **k: 8):
        _compare(spec, w, x, diag, atol=2e-4)


def test_q11_bfly_default_matches_fused():
    """Q11 (hi=16) became the butterfly default in round 5 (+15%
    measured): fwd + VJP at the new boundary must match the XLA fused
    engine."""
    spec, w, x, diag = _case(11, (1, 1, 1, 1), 3)
    assert pf._bfly_mode(11) and pf.pfused_applicable(spec)
    _compare(spec, w, x, diag, atol=2e-4)
