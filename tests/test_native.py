"""
Native C++ datagen library tests (skipped when no compiler/.so).
"""
import numpy as np
import pytest

import quanonet_tpu.data.generation as gen
from quanonet_tpu.data.native import native_available

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native library not built")


@pytest.fixture(autouse=True)
def _data_root(tmp_path, monkeypatch):
    monkeypatch.setattr(gen, 'DATA_ROOT', str(tmp_path / 'raw'))
    yield


def test_native_ode_matches_scipy():
    from scipy.integrate import solve_ivp
    from quanonet_tpu.data.native import solve_ode_batch_native
    np.random.seed(0)
    u0s = np.stack([gen.generate_random_gaussian_field(1024)[1]
                    for _ in range(3)]).astype(np.float32)
    num_cal = 300
    grid = np.linspace(0, 1, 1024)
    x = np.linspace(0, 1, num_cal)
    for op, rhs in [('Antideriv', lambda fn: lambda t, y: fn(t)),
                    ('Nonlinear', lambda fn: lambda t, y: -y ** 3 + fn(t))]:
        out = solve_ode_batch_native(op, u0s, num_cal)
        fn = lambda t: np.interp(t, grid, u0s[0])
        ref = solve_ivp(rhs(fn), [0, 1], [0], t_eval=x,
                        method='RK45').y[0]
        np.testing.assert_allclose(out[0], ref, atol=5e-3)


def test_native_stencils_match_host():
    from quanonet_tpu.data.native import (
        solve_advection_batch_native, solve_rdiffusion_batch_native,
    )
    np.random.seed(1)
    _, u0 = gen.generate_random_gaussian_field(80)
    host_u, _ = gen.solve_advection_pde(80, u0_cal=u0)
    nat = solve_advection_batch_native(u0.astype(np.float32)[None])[0]
    np.testing.assert_allclose(nat, host_u, atol=1e-4)

    _, u0 = gen.generate_random_gaussian_field(40)
    host_u, _ = gen.solve_rdiffusion_pde(40, 0.2, u0_cal=u0)
    nat = solve_rdiffusion_batch_native(u0.astype(np.float32)[None])[0]
    assert nat.shape == host_u.shape
    np.testing.assert_allclose(nat, host_u, atol=1e-4)


def test_native_pipeline_env_flag(monkeypatch):
    """QUANONET_NATIVE=1 routes the raw-solve loop through C++ and yields
    a consistent dataset (Antideriv: du/dx = u0)."""
    monkeypatch.setenv('QUANONET_NATIVE', '1')
    np.random.seed(2)
    u0_tr, u_tr, _, _, x = gen.generate_ode_operator_data(
        'Antideriv', 3, 1, 60, 60, num_cal=200)
    du = np.gradient(u_tr[0], x)
    np.testing.assert_allclose(du[2:-2], u0_tr[0][2:-2], atol=0.05)
