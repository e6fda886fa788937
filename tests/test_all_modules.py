"""Parametrized import smoke over every fmdm_tpu module (reference test
strategy, tests/test_all_modules.py:14-41), plus run_self_tests hook execution
where modules define one."""

import importlib
import pkgutil

import pytest

import fmdm_tpu


def _module_names():
    names = ["fmdm_tpu"]
    for mod in pkgutil.walk_packages(fmdm_tpu.__path__, prefix="fmdm_tpu."):
        names.append(mod.name)
    return sorted(set(names))


@pytest.mark.parametrize("name", _module_names())
def test_module_imports(name):
    module = importlib.import_module(name)
    hook = getattr(module, "run_self_tests", None)
    if callable(hook):
        hook()


def test_alias_imports():
    """Legacy 'datasets.*' config strings resolve (dataset_utils MODULE_ALIASES)."""
    from fmdm_tpu.data.dataset_utils import _import_symbol

    assert _import_symbol("datasets.mnist:MNISTDataset") is not None
    assert _import_symbol("datasets.ldct:LDCTDataset") is not None
    assert _import_symbol("datasets.ldct:LDCTAttentionDataset") is not None
    assert _import_symbol("datasets.base:BaseDataset") is not None
    with pytest.raises(ValueError):
        _import_symbol("no_colon_here")


def test_summarize_model(capsys):
    import jax
    from fmdm_tpu.nn.blocks import ResBlockND
    from fmdm_tpu.utils.summary import summarize_model

    block = ResBlockND(channels=8, emb_channels=16, dropout=0.0)
    params = block.init(jax.random.PRNGKey(0))
    total = summarize_model(params, {}, {})
    out = capsys.readouterr().out
    assert "TOTAL" in out and total > 0
    assert summarize_model(params, {}, {"show_model_summary": False}) == total
