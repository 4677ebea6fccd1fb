"""Packaging contract: console-script targets resolve and stay callable."""
import importlib
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _console_scripts():
    text = open(os.path.join(REPO, 'pyproject.toml')).read()
    block = text.split('[project.scripts]', 1)[1].split('[', 1)[0]
    return dict(re.findall(r'(\S+)\s*=\s*"([^"]+)"', block))


def test_console_script_targets_resolve():
    scripts = _console_scripts()
    assert set(scripts) == {'quanonet-train', 'quanonet-infer',
                            'quanonet-serve'}
    for target in scripts.values():
        mod_name, func_name = target.split(':')
        mod = importlib.import_module(mod_name)
        assert callable(getattr(mod, func_name))


def test_root_main_delegates_to_cli():
    # the reference-compat launcher and the console script must share one
    # implementation (quanonet_tpu/cli.py)
    src = open(os.path.join(REPO, 'main.py')).read()
    assert 'from quanonet_tpu.cli import main' in src


def test_cli_help_exits_zero(capsys):
    import pytest
    from quanonet_tpu.cli import main
    with pytest.raises(SystemExit) as e:
        main(['--help'])
    assert e.value.code == 0
    assert '--operator' in capsys.readouterr().out
