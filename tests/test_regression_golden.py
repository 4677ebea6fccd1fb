"""
Golden-output regression fixtures: engine outputs for fixed inputs,
pinned at round 1 (when all conventions were validated against the
shipped checkpoints, an independent NumPy oracle, and the reference's
demo numbers).  Future refactors must reproduce these to 1e-4.

Regenerate ONLY after re-validating conventions end-to-end:
    python tests/test_regression_golden.py --regen
"""
import os

import jax
import jax.numpy as jnp
import numpy as np

from quanonet_tpu.ops.hamiltonian import simple_ham_diag
from quanonet_tpu.ops.hea import hea_expectation, quanonet_spec

FIXTURE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       'fixtures', 'golden_engine_outputs.npz')


def _case():
    spec = quanonet_spec(3, (4, 2, 3, 1))
    rng = np.random.RandomState(2024)
    w = jnp.asarray(rng.uniform(-np.pi, np.pi,
                                spec.weight_shape()).astype(np.float32))
    x = jnp.asarray(rng.uniform(-2, 2,
                                (6, spec.total_encode)).astype(np.float32))
    diag = jnp.asarray(simple_ham_diag(3, -5, 5))
    return spec, w, x, diag


def _compute():
    spec, w, x, diag = _case()
    out = np.asarray(hea_expectation(spec, w, x, diag=diag, engine='dense'))
    grad = np.asarray(jax.grad(
        lambda w_: jnp.sum(hea_expectation(spec, w_, x, diag=diag,
                                           engine='dense') ** 2))(w))
    return out, grad


def test_engine_outputs_match_round1_golden():
    d = np.load(FIXTURE)
    out, grad = _compute()
    np.testing.assert_allclose(out, d['out'], atol=1e-4)
    np.testing.assert_allclose(grad, d['grad'], atol=1e-4)


if __name__ == '__main__':
    import sys
    if '--regen' in sys.argv:
        os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
        out, grad = _compute()
        np.savez(FIXTURE, out=out, grad=grad)
        print(f"wrote {FIXTURE}: out {out.ravel()[:3]}")
