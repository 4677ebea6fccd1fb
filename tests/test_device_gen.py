"""
Device-side data generation tests: distribution parity with the host path
(GRF statistics), ODE solution accuracy vs SciPy RK45, PDE stencil parity
with the vectorised host solvers.
"""
import jax
import numpy as np
import pytest

import quanonet_tpu.data.generation as host_gen
from quanonet_tpu.data.device_gen import (
    generate_ode_batch, generate_pde_batch, sample_grf,
    solve_advection_batch, solve_rdiffusion_batch,
)


@pytest.fixture(autouse=True)
def _data_root(tmp_path, monkeypatch):
    monkeypatch.setattr(host_gen, 'DATA_ROOT', str(tmp_path / 'raw'))
    yield


def test_grf_distribution_matches_host():
    key = jax.random.PRNGKey(0)
    dev, _ = sample_grf(key, 300, 128)
    dev = np.asarray(dev)
    assert abs(dev.mean()) < 0.15
    assert 0.7 < dev.var() < 1.3
    # same smoothness as host GRF: neighbor correlation
    c = np.corrcoef(dev[:, 60], dev[:, 61])[0, 1]
    assert c > 0.99


@pytest.mark.parametrize("operator", ['Antideriv', 'Homogeneous',
                                      'Nonlinear', 'Identity'])
def test_ode_matches_scipy(operator):
    """Device RK4 vs host solve_ivp RK45 on the SAME input function."""
    from scipy.integrate import solve_ivp
    key = jax.random.PRNGKey(1)
    num_cal = 200
    u0_m, u = generate_ode_batch(key, operator, 4, num_cal, num_cal,
                                 num_cal=num_cal)
    u0_m, u = np.asarray(u0_m), np.asarray(u)
    x_cal = np.linspace(0, 1, num_cal)
    for b in range(2):
        u0_fn = lambda x: np.interp(x, x_cal, u0_m[b])
        if operator == 'Identity':
            np.testing.assert_allclose(u[b], u0_m[b], atol=1e-5)
            continue
        rhs = {'Antideriv': lambda x, y: u0_fn(x),
               'Homogeneous': lambda x, y: y + u0_fn(x),
               'Nonlinear': lambda x, y: -y ** 3 + u0_fn(x)}[operator]
        sol = solve_ivp(rhs, [0, 1], [0], t_eval=x_cal, method='RK45')
        np.testing.assert_allclose(u[b], sol.y[0], atol=5e-3)


def test_advection_matches_host_stencil():
    np.random.seed(0)
    _, u0 = host_gen.generate_random_gaussian_field(96)
    host_u, _ = host_gen.solve_advection_pde(96, u0_cal=u0)
    dev_u = np.asarray(solve_advection_batch(
        np.asarray(u0, np.float32)[None]))[0]
    np.testing.assert_allclose(dev_u, host_u, atol=1e-4)


def test_rdiffusion_matches_host_stencil():
    np.random.seed(1)
    _, u0 = host_gen.generate_random_gaussian_field(50)
    host_u, _ = host_gen.solve_rdiffusion_pde(50, 0.2, u0_cal=u0)
    dev_u = np.asarray(solve_rdiffusion_batch(
        np.asarray(u0, np.float32)[None]))[0]
    assert dev_u.shape == host_u.shape
    np.testing.assert_allclose(dev_u, host_u, atol=1e-4)


def test_darcy_cg_matches_host_sparse_solve():
    """Device CG solve vs the host scipy spsolve on the same boundary
    field (incl. the corner-precedence convention)."""
    from quanonet_tpu.data.device_gen import solve_darcy_batch
    np.random.seed(7)
    num_cal = 24
    _, u0 = host_gen.generate_random_gaussian_field(4 * num_cal,
                                                    length_scale=1.0)
    host_u, _ = host_gen.solve_darcy_pde(num_cal, u0_cal=u0)
    dev_u = np.asarray(solve_darcy_batch(
        np.asarray(u0, np.float32)[None]))[0]
    assert dev_u.shape == host_u.shape
    np.testing.assert_allclose(dev_u, host_u, atol=2e-3)


def test_pde_batch_shapes():
    key = jax.random.PRNGKey(2)
    u0, u = generate_pde_batch(key, 'Advection', 3, 32, 16, num_cal=64)
    assert u0.shape == (3, 16)
    assert u.shape == (3, 32, 32)
    assert np.isfinite(np.asarray(u)).all()
    u0d, ud = generate_pde_batch(key, 'Darcy', 2, 20, 12, num_cal=20)
    assert u0d.shape == (2, 12)
    assert ud.shape == (2, 20, 20)
    assert np.isfinite(np.asarray(ud)).all()
