"""CLI / config-system tests: YAML loading, grid expansion, multi_run
save-path suffixing, and config validation (reference main.py:27-105,
model/model_handler.py:780-812)."""
import numpy as np
import pytest
import yaml

from advmil_tpu.config import (get_config, grid, grid_hyperparams,
                               check_configs, with_defaults)
from advmil_tpu.data.synthetic import make_synthetic_dataset
from tests.test_train_smoke import base_cfg


def test_grid_expansion():
    cfg = {"a": 1, "b": [1, 2], "c": ["x", "y", "z"]}
    combos = grid(cfg)
    assert len(combos) == 6
    assert grid_hyperparams(cfg) == ["b", "c"]
    assert all(c["a"] == 1 for c in combos)
    assert {(c["b"], c["c"]) for c in combos} == {(b, cc) for b in [1, 2]
                                                  for cc in "xyz"}


def test_get_config_applies_defaults(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text(yaml.dump({"task": "cont_gansurv", "seed": 1}))
    cfg = get_config(str(p))
    assert cfg["dp_devices"] == 1
    assert cfg["batch_token_budget"] == 32768
    assert cfg["task"] == "cont_gansurv"


def test_check_configs_rejects_bad_combos(tmp_path):
    synth_dir = str(tmp_path)
    paths = make_synthetic_dataset(synth_dir, n_patients=6, dim=16,
                                   min_regions=2, max_regions=3)
    cfg = base_cfg(paths, tmp_path)
    check_configs(dict(cfg))  # valid
    bad = dict(cfg)
    bad["gen_out_scale"] = "exp"  # sigmoid<->ratio coupling violated
    with pytest.raises(AssertionError):
        check_configs(bad)
    bad2 = dict(cfg)
    bad2["times_test_sample"] = 1  # noise present requires >1
    with pytest.raises(AssertionError):
        check_configs(bad2)
    bad3 = dict(cfg)
    bad3["disc_netx_in_dim"] = 999
    with pytest.raises(AssertionError):
        check_configs(bad3)


def test_multi_run_appends_save_path_suffix(tmp_path, monkeypatch):
    import main as cli
    calls = []

    class FakeHandler:
        def __init__(self, cfg):
            calls.append(cfg["save_path"])

        def exec(self):
            return {}

    cfg = {"save_path": "base", "data_split_seed": [0, 1], "semi_training": False,
           "test": False}
    cli.multi_run_main(FakeHandler, cfg)
    assert calls == ["base-data_split_seed_0", "base-data_split_seed_1"]


def test_apply_rng_impl_accepts_every_documented_name():
    """'threefry' (the parity harness's pin) must alias to JAX's registered
    'threefry2x32'; all documented values round-trip; junk is rejected."""
    import jax
    import pytest as _pytest
    from advmil_tpu.config import apply_rng_impl
    before = jax.config.jax_default_prng_impl
    try:
        for name, expect in [("threefry", "threefry2x32"),
                             ("threefry2x32", "threefry2x32"),
                             ("rbg", "rbg"), ("unsafe_rbg", "unsafe_rbg")]:
            apply_rng_impl({"rng_impl": name})
            assert jax.config.jax_default_prng_impl == expect
        apply_rng_impl({})  # shipped default
        assert jax.config.jax_default_prng_impl == "rbg"
        with _pytest.raises(AssertionError):
            apply_rng_impl({"rng_impl": "mersenne"})
    finally:
        jax.config.update("jax_default_prng_impl", before)
