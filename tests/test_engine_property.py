"""
Randomized cross-engine property sweep: seeded random circuit shapes
(qubit count, per-block depths, ragged batch sizes) pushed through all
five gate-application strategies, asserting forward AND gradient
agreement against the dense oracle.

Widens the fixed-spec grids of test_engine.py / test_pallas.py /
test_fused_gates.py the way the reference's compare_backends.py used
randomized weights across its five backends
(reference compare_backends.py:140-212) — here the diversity is in the
circuit SHAPE as well, since one engine serves every architecture.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quanonet_tpu.ops.hamiltonian import simple_ham_diag
from quanonet_tpu.ops.hea import HEASpec, hea_expectation

N_CASES = 8


def _random_case(seed):
    rng = np.random.RandomState(1000 + seed)
    nq = int(rng.randint(2, 7))                    # 2..6 qubits
    n_blocks = int(rng.randint(2, 7))              # 2..6 blocks
    # uniform encode (every engine supports it); random sublayer depths,
    # including an occasional encoding-only block (ld=0)
    cfg = tuple((nq, int(rng.randint(0, 4))) for _ in range(n_blocks))
    if all(ld == 0 for _, ld in cfg):              # ensure some ansatz
        cfg = cfg[:-1] + ((nq, 1),)
    spec = HEASpec(nq, cfg)
    batch = int(rng.randint(1, 12))                # ragged batches
    w = jnp.asarray(rng.uniform(-np.pi, np.pi,
                                spec.weight_shape()).astype(np.float32))
    x = jnp.asarray(rng.uniform(-2, 2,
                                (batch, spec.total_encode))
                    .astype(np.float32))
    lb, ub = sorted(rng.uniform(-8, 8, 2).tolist())
    diag = jnp.asarray(simple_ham_diag(nq, lb, ub))
    return spec, w, x, diag


# dense-oracle results cached per seed: the dense fwd/grad would
# otherwise be recompiled identically for each of the 4 engine
# parametrizations (single-core XLA compile dominates this file)
_DENSE_FWD = {}
_DENSE_GRAD = {}


def _dense_fwd(seed):
    if seed not in _DENSE_FWD:
        spec, w, x, diag = _random_case(seed)
        _DENSE_FWD[seed] = np.asarray(
            hea_expectation(spec, w, x, diag=diag, engine='dense'))
    return _DENSE_FWD[seed]


def _loss(spec, x, diag, engine):
    def f(w):
        return jnp.sum(hea_expectation(spec, w, x, diag=diag,
                                       engine=engine) ** 2)
    return f


def _dense_grad(seed):
    if seed not in _DENSE_GRAD:
        spec, w, x, diag = _random_case(seed)
        _DENSE_GRAD[seed] = np.asarray(
            jax.grad(_loss(spec, x, diag, 'dense'))(w))
    return _DENSE_GRAD[seed]


@pytest.mark.parametrize("engine", ["gates", "pallas", "embed", "fused"])
@pytest.mark.parametrize("seed", range(N_CASES))
def test_random_spec_forward_matches_dense(seed, engine):
    spec, w, x, diag = _random_case(seed)
    out_e = hea_expectation(spec, w, x, diag=diag, engine=engine)
    np.testing.assert_allclose(np.asarray(out_e), _dense_fwd(seed),
                               atol=1e-4)


@pytest.mark.parametrize("engine", ["gates", "pallas", "embed", "fused"])
@pytest.mark.parametrize("seed", range(0, N_CASES, 2))
def test_random_spec_grad_matches_dense(seed, engine):
    spec, w, x, diag = _random_case(seed)
    g_e = jax.grad(_loss(spec, x, diag, engine))(w)
    np.testing.assert_allclose(np.asarray(g_e), _dense_grad(seed),
                               atol=2e-4)
