"""
Config and logger unit tests: precedence rules, experiment-ID variants,
artifact paths.
"""
import json
import os

from quanonet_tpu.config import get_base_parser, load_config, parse_bool
from quanonet_tpu.logger import ExperimentLogger, get_experiment_id


def test_cli_over_json_over_defaults(tmp_path):
    cfg_file = tmp_path / 'c.json'
    cfg_file.write_text(json.dumps({
        'num_epochs': 77, 'learning_rate': 0.5, 'seed': 9,
        'optimizer': 'sgd',
    }))
    args = get_base_parser().parse_args([
        '--operator', 'Antideriv', '--model_type', 'FNN',
        '--config', str(cfg_file), '--learning_rate', '0.25'])
    cfg = load_config(args)
    assert cfg['learning_rate'] == 0.25     # CLI wins
    assert cfg['num_epochs'] == 77          # JSON beats default
    assert cfg['seed'] == 9                 # JSON beats sentinel default
    assert cfg['optimizer'] == 'sgd'        # JSON-only extra key survives
    assert cfg['batch_size'] == 100         # built-in default


def test_none_sentinel_does_not_clobber_json(tmp_path):
    # the reference's None-sentinel trick (utils/common.py:10-23): flags
    # with non-None "defaults" must not override JSON when not passed
    cfg_file = tmp_path / 'c.json'
    cfg_file.write_text(json.dumps({'num_qubits': 3,
                                    'if_trainable_freq': 'false'}))
    args = get_base_parser().parse_args([
        '--operator', 'X', '--model_type', 'FNN', '--config', str(cfg_file)])
    cfg = load_config(args)
    assert cfg['num_qubits'] == 3
    assert parse_bool(cfg['if_trainable_freq']) is False


def test_experiment_id_variants():
    base = dict(operator='Antideriv', model_type='QuanONet',
                net_size=[20, 2, 10, 2], num_qubits=5,
                if_trainable_freq='true', scale_coeff=0.01,
                num_train=1000, num_points=100, seed=3)
    assert get_experiment_id(base) == \
        'Antideriv_QuanONet_Net20-2-10-2_Q5_TF_S0.01_1000x100_Seed3'
    # Pauli suffix only when non-Z
    assert '_PauliX_' in get_experiment_id({**base, 'ham_pauli': 'X'})
    assert '_Pauli' not in get_experiment_id({**base, 'ham_pauli': 'Z'})
    # ham_diag beats ham_bound in the name
    eid = get_experiment_id({**base, 'ham_diag': [-5, 0, 0, 5]})
    assert '_Diag-5-0-0-5_' in eid
    # non-default bounds
    assert '_Ham-2-2_' in get_experiment_id({**base, 'ham_bound': [-2, 2]})
    # default bounds produce no suffix
    assert '_Ham' not in get_experiment_id({**base, 'ham_bound': [-5, 5]})
    # FF marker
    assert '_FF_' in get_experiment_id({**base, 'if_trainable_freq': 'false'})
    # classical models carry no quantum fields
    eid = get_experiment_id(dict(operator='Darcy', model_type='DeepONet',
                                 net_size=[3, 15, 3, 15], num_train=1000,
                                 num_points=25, seed=0))
    assert eid == 'Darcy_DeepONet_Net3-15-3-15_1000x25_Seed0'


def test_experiment_logger_artifacts(tmp_path):
    cfg = dict(operator='Antideriv', model_type='FNN', net_size=[2, 8],
               num_train=10, num_points=20, seed=0)
    lg = ExperimentLogger(cfg, base_output_dir=str(tmp_path))
    assert os.path.exists(os.path.join(lg.exp_dir, 'train_args.json'))
    assert not lg.is_completed()
    lg.save_metrics({'rel_l2': 0.1}, history={'loss_train': [1.0]})
    assert lg.is_completed()
    m = json.load(open(os.path.join(lg.exp_dir, 'metric.json')))
    assert m['metrics']['rel_l2'] == 0.1
    assert lg.get_ckpt_path().endswith('best_model.ckpt')
    assert lg.get_ckpt_path(is_final=True).endswith('final.ckpt')
    assert lg.get_ckpt_path(iteration=7).endswith('iter_00007.ckpt')
    lg.close()
