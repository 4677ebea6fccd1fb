"""
Data pipeline tests: GRF statistics, ODE/PDE solver sanity, encoder shapes,
cache filename contract, and cache round-trip.
"""
import numpy as np
import pytest

import quanonet_tpu.data.generation as gen
from quanonet_tpu.data.manager import DataManager


@pytest.fixture(autouse=True)
def _data_root(tmp_path, monkeypatch):
    monkeypatch.setattr(gen, 'DATA_ROOT', str(tmp_path / 'raw'))
    yield


def test_grf_statistics():
    np.random.seed(1)
    samples = np.stack([gen.generate_random_gaussian_field(256)[1]
                        for _ in range(200)])
    assert abs(samples.mean()) < 0.15
    # marginal variance of the GP is output_scale = 1
    assert 0.7 < samples.var() < 1.3
    # smoothness: neighboring points highly correlated at l=0.2
    corr = np.corrcoef(samples[:, 100], samples[:, 101])[0, 1]
    assert corr > 0.99


def test_grf_cholesky_cached_identical():
    # caching the factor must not change samples for a fixed randn stream
    np.random.seed(7)
    _, a = gen.generate_random_gaussian_field(64)
    np.random.seed(7)
    _, b = gen.generate_random_gaussian_field(64)
    np.testing.assert_array_equal(a, b)


def test_antideriv_is_integral():
    np.random.seed(2)
    u0_tr, u_tr, _, _, x = gen.generate_ode_operator_data(
        'Antideriv', 2, 1, 50, 50, num_cal=200)
    # du/dx = u0, u(0)=0  ->  finite-difference derivative of u ~ u0
    du = np.gradient(u_tr[0], x)
    mask = slice(2, -2)
    np.testing.assert_allclose(du[mask], u0_tr[0][mask], atol=0.05)
    assert abs(u_tr[0][0]) < 1e-6  # y0 = 0


def test_identity_operator():
    np.random.seed(3)
    u0_tr, u_tr, u0_te, u_te, _ = gen.generate_ode_operator_data(
        'Identity', 3, 2, 40, 40, num_cal=100)
    np.testing.assert_allclose(u_tr, u0_tr, atol=1e-6)


def test_advection_transport():
    # constant-speed advection: u(x, t) ~ u0(x - c t) (periodic)
    np.random.seed(4)
    u, u0 = gen.solve_advection_pde(128, length_scale=0.5)
    assert u.shape == (128, 128)
    np.testing.assert_allclose(u[:, 0], u0, atol=1e-9)
    # upwind is diffusive; check circular-shift correlation at mid-time
    t_idx = 64
    shift = int(round(t_idx / 127 * 127))  # c=1: x-shift = t
    shifted = np.roll(u0, shift)
    c = np.corrcoef(u[:, t_idx], shifted)[0, 1]
    assert c > 0.9


def test_rdiffusion_shapes_and_bc():
    np.random.seed(5)
    u, u0 = gen.solve_rdiffusion_pde(60, 0.2)
    assert u.shape[0] == 60
    np.testing.assert_allclose(u[0, :], 0, atol=1e-12)
    np.testing.assert_allclose(u[-1, :], 0, atol=1e-12)
    assert np.isfinite(u).all()


def test_darcy_boundary_and_interior():
    np.random.seed(6)
    u, u0 = gen.solve_darcy_pde(20, length_scale=1.0)
    assert u.shape == (20, 20)
    edge = len(u0) // 4
    # bottom row j=0 = u0[3e:][::-1][i]; top j=ny-1 = u0[e:2e][i]
    np.testing.assert_allclose(u[:, 0], u0[3 * edge:][::-1], atol=1e-8)
    np.testing.assert_allclose(u[:, -1], u0[edge:2 * edge], atol=1e-8)
    np.testing.assert_allclose(u[0, 1:-1], u0[:edge][1:-1], atol=1e-8)
    assert np.isfinite(u).all()


def test_manager_shapes_and_cache(tmp_path):
    np.random.seed(0)
    cfg = dict(operator='Antideriv', model_type='QuanONet', num_train=6,
               num_test=4, num_points=30, num_points_0=10,
               train_sample_num=5, test_sample_num=8)
    dm = DataManager(cfg, data_dir=str(tmp_path / 'proc'))
    assert dm._get_filename() == 'Antideriv_6_4_30_10_5_8.npz'
    d = dm.get_data()
    assert d['train_branch_input'].shape == (30, 10)
    assert d['train_trunk_input'].shape == (30, 1)
    assert d['train_output'].shape == (30, 1)
    assert d['test_branch_input'].shape == (32, 10)
    assert d['train_input'].shape == (30, 11)
    # second call loads from cache and returns identical arrays
    d2 = DataManager(cfg, data_dir=str(tmp_path / 'proc')).get_data()
    np.testing.assert_array_equal(d['train_output'], d2['train_output'])


def test_manager_fno_format(tmp_path):
    np.random.seed(0)
    cfg = dict(operator='Antideriv', model_type='FNO', num_train=4,
               num_test=3, num_points=32, num_points_0=32)
    dm = DataManager(cfg, data_dir=str(tmp_path / 'proc'))
    assert dm._get_filename() == 'Antideriv_4_3_32_32_FNO.npz'
    d = dm.get_data()
    assert d['train_input'].shape == (4, 32, 2)
    assert d['train_output'].shape == (4, 32, 1)


def test_manager_pde_trunk_is_2d(tmp_path):
    np.random.seed(0)
    cfg = dict(operator='Advection', model_type='QuanONet', num_train=3,
               num_test=2, num_points=16, num_points_0=16, num_cal=32,
               train_sample_num=4, test_sample_num=6)
    d = DataManager(cfg, data_dir=str(tmp_path / 'proc')).get_data()
    assert d['train_trunk_input'].shape == (12, 2)
    assert d['train_branch_input'].shape == (12, 16)


# ── encoder byte contract ────────────────────────────────────────────────────
# The encoders must emit byte-identical arrays to the reference's
# data_processing.py (shared dataset-cache files).  These hashes were
# captured from the straight-port implementation; any change to RNG
# draw order, gather semantics, or dtype flow breaks them.

def _fake_ode_gen(num_train, num_test, num_points, num_points_0,
                  num_cal=None):
    rng = np.random.RandomState(7)
    return (rng.randn(num_train, num_points_0),
            rng.randn(num_train, num_points),
            rng.randn(num_test, num_points_0),
            rng.randn(num_test, num_points),
            np.linspace(0, 1, num_points))


def _fake_pde_gen(num_train, num_test, num_points, num_points_0,
                  num_cal=None):
    rng = np.random.RandomState(9)
    return (rng.randn(num_train, num_points_0),
            rng.randn(num_train, num_points, num_points),
            rng.randn(num_test, num_points_0),
            rng.randn(num_test, num_points, num_points),
            np.linspace(0, 1, num_points),
            np.linspace(0, 2, num_points))


def _digest(arrays):
    import hashlib
    h = hashlib.sha256()
    for a in arrays:
        if a is not None:
            h.update(np.ascontiguousarray(a).tobytes())
    return h.hexdigest()[:16]


def test_encoder_byte_contract():
    from quanonet_tpu.data import processing as P
    np.random.seed(0)
    assert _digest(P.ode_encode(_fake_ode_gen, 6, 4, 50, 30, 12, 8)) == \
        '64f33c0553394619'
    np.random.seed(1)
    assert _digest(P.pde_encode(_fake_pde_gen, 5, 3, 20, 10, 15, 9)) == \
        '931419705a951aae'
    assert _digest(P.ode_fncode(_fake_ode_gen, 6, 4, 40)) == \
        'b1de8fb7d8d30df8'
    assert _digest(P.pde_fncode(_fake_pde_gen, 5, 3, 20)) == \
        '34359d25786035ba'
