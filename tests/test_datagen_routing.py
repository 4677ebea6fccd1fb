"""
--datagen {host,device,native} routing through DataManager
(VERDICT r3 item 5: wire device/native datagen into the standard path).

The host path's byte contract is guarded by test_data.py; these tests pin
the ROUTING semantics: distinct cache filenames per generator (non-host
results are distribution-level, not byte-level, equivalents — they must
never be written into a reference-contract cache file), legacy
QUANONET_NATIVE env mapping, the input_sampler force-to-host rule, and
that the device path produces encoder-ready data end-to-end.
"""
import numpy as np
import pytest

import quanonet_tpu.data.generation as host_gen
from quanonet_tpu.data.manager import DataManager


@pytest.fixture(autouse=True)
def _data_root(tmp_path, monkeypatch):
    monkeypatch.setattr(host_gen, 'DATA_ROOT', str(tmp_path / 'raw'))
    monkeypatch.delenv('QUANONET_NATIVE', raising=False)
    yield


def _ode_cfg(**kw):
    cfg = dict(operator='Antideriv', model_type='QuanONet', num_train=6,
               num_test=4, num_points=30, num_points_0=10, num_cal=64,
               train_sample_num=5, test_sample_num=8)
    cfg.update(kw)
    return cfg


def test_filename_suffix_per_generator(tmp_path):
    base = 'Antideriv_6_4_30_10_5_8'
    for datagen, name in [(None, f'{base}.npz'),
                          ('host', f'{base}.npz'),
                          ('device', f'{base}_dgdevice.npz'),
                          ('native', f'{base}_dgnative.npz')]:
        cfg = _ode_cfg() if datagen is None else _ode_cfg(datagen=datagen)
        dm = DataManager(cfg, data_dir=str(tmp_path / 'proc'))
        assert dm._get_filename() == name, datagen


def test_invalid_datagen_raises(tmp_path):
    with pytest.raises(ValueError, match='datagen'):
        DataManager(_ode_cfg(datagen='gpu'), data_dir=str(tmp_path))


def test_legacy_env_maps_to_native(tmp_path, monkeypatch):
    monkeypatch.setenv('QUANONET_NATIVE', '1')
    dm = DataManager(_ode_cfg(), data_dir=str(tmp_path / 'proc'))
    assert dm.datagen == 'native'
    # explicit --datagen beats the env var
    dm = DataManager(_ode_cfg(datagen='device'),
                     data_dir=str(tmp_path / 'proc'))
    assert dm.datagen == 'device'


def test_input_sampler_forces_host(tmp_path):
    dm = DataManager(_ode_cfg(datagen='device'),
                     data_dir=str(tmp_path / 'proc'),
                     input_sampler=lambda n: (None, np.zeros(n)))
    assert dm.datagen == 'host'


def test_device_ode_end_to_end(tmp_path):
    np.random.seed(0)
    dm = DataManager(_ode_cfg(datagen='device'),
                     data_dir=str(tmp_path / 'proc'))
    d = dm.get_data()
    assert d['train_branch_input'].shape == (30, 10)
    assert d['train_trunk_input'].shape == (30, 1)
    assert d['train_output'].shape == (30, 1)
    assert d['test_branch_input'].shape == (32, 10)
    assert np.isfinite(d['train_output']).all()
    # Antideriv outputs are integrals of a unit-variance GRF: sane scale
    assert 0.01 < np.abs(d['train_output']).max() < 20.0
    # cached under the device filename; reload is identical
    np.random.seed(0)
    d2 = DataManager(_ode_cfg(datagen='device'),
                     data_dir=str(tmp_path / 'proc')).get_data()
    np.testing.assert_array_equal(d['train_output'], d2['train_output'])
    # the reference-contract (host) cache file must NOT exist
    assert not (tmp_path / 'proc' / 'Antideriv'
                / 'Antideriv_6_4_30_10_5_8.npz').exists()


def test_device_pde_end_to_end(tmp_path):
    np.random.seed(0)
    cfg = dict(operator='Advection', model_type='QuanONet', num_train=3,
               num_test=2, num_points=16, num_points_0=16, num_cal=32,
               train_sample_num=4, test_sample_num=6, datagen='device')
    d = DataManager(cfg, data_dir=str(tmp_path / 'proc')).get_data()
    assert d['train_trunk_input'].shape == (12, 2)
    assert d['train_branch_input'].shape == (12, 16)
    assert np.isfinite(d['train_output']).all()


def test_native_ode_end_to_end(tmp_path):
    from quanonet_tpu.data.native import native_available
    if not native_available():
        pytest.skip('native library unavailable')
    np.random.seed(0)
    d = DataManager(_ode_cfg(datagen='native'),
                    data_dir=str(tmp_path / 'proc')).get_data()
    assert d['train_branch_input'].shape == (30, 10)
    assert np.isfinite(d['train_output']).all()
    # RK4 raw cache lands under the _rk4 tag, never the RK45 file
    raw = tmp_path / 'raw' / 'Antideriv_Operator_data'
    assert (raw / 'Antideriv_Operator_data_64_1_rk4.npz').exists()
    assert not (raw / 'Antideriv_Operator_data_64_1.npz').exists()
    # distribution-level parity with the host path on the same seed
    np.random.seed(0)
    h = DataManager(_ode_cfg(), data_dir=str(tmp_path / 'proc2')).get_data()
    np.testing.assert_allclose(d['train_output'], h['train_output'],
                               atol=5e-3)


def test_native_pde_end_to_end(tmp_path):
    from quanonet_tpu.data.native import native_available
    if not native_available():
        pytest.skip('native library unavailable')
    np.random.seed(0)
    cfg = dict(operator='Advection', model_type='QuanONet', num_train=3,
               num_test=2, num_points=16, num_points_0=16, num_cal=32,
               train_sample_num=4, test_sample_num=6, datagen='native')
    d = DataManager(cfg, data_dir=str(tmp_path / 'proc')).get_data()
    assert np.isfinite(d['train_output']).all()
    raw = tmp_path / 'raw' / 'Advection_Operator_data'
    assert (raw / 'Advection_Operator_data_32_1_native.npz').exists()
    # f32-stencil parity with the float64 host path on the same seed
    np.random.seed(0)
    cfg_h = dict(cfg)
    del cfg_h['datagen']
    h = DataManager(cfg_h, data_dir=str(tmp_path / 'proc2')).get_data()
    np.testing.assert_allclose(d['train_output'], h['train_output'],
                               atol=1e-3)
