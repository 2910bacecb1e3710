"""Config parsing/merging tests (reference configs/parser.py semantics)."""

from sdformerflow_tpu.training.config import (combine_entries, load_config,
                                              merge_eval_config)

import pytest

pytestmark = pytest.mark.smoke


def test_merge_eval_config_overrides_scalars_and_dicts():
    train = {"experiment": "train_run", "loader": {"batch_size": 8,
                                                   "crop": [288, 384]},
             "model": {"name": "X"}}
    evalc = {"experiment": "eval_run", "loader": {"batch_size": 1}}
    merged = merge_eval_config(train, evalc)
    # scalar top-level override applies (parser.py:104-121 re-hydrates all)
    assert merged["experiment"] == "eval_run"
    # dict-valued keys merge recursively, eval wins per-key
    assert merged["loader"]["batch_size"] == 1
    assert merged["loader"]["crop"] == [288, 384]
    # keys absent from the eval config survive
    assert merged["model"]["name"] == "X"
    # inputs not mutated
    assert train["loader"]["batch_size"] == 8


def test_combine_entries_folds_spiking_neuron_into_model():
    cfg = {"model": {"name": "M"}, "spiking_neuron": {"v_th": 0.5}}
    out = combine_entries(cfg)
    assert out["model"]["spiking_neuron"] == {"v_th": 0.5}
    assert "spiking_neuron" not in out
