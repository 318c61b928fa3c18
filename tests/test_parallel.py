"""Data-parallel training over a virtual 8-device CPU mesh: the full
adversarial handler with dp_devices=8, plus sharding primitives."""
import jax
import numpy as np
import pytest

from advmil_tpu.config import with_defaults
from advmil_tpu.data.synthetic import make_synthetic_dataset
from advmil_tpu.parallel.mesh import make_mesh, shard_batch, replicate_state
from tests.test_train_smoke import base_cfg


def test_mesh_and_sharding_primitives():
    assert len(jax.devices()) == 8, "conftest must fake 8 CPU devices"
    mesh = make_mesh(8)
    batch = {"feats": np.zeros((16, 32, 8), np.float32),
             "mask": np.ones((16, 32), np.float32)}
    sharded = shard_batch(batch, mesh)
    assert sharded["feats"].sharding.num_devices == 8
    params = {"w": np.ones((4, 4), np.float32)}
    rep = replicate_state(params, mesh)
    assert rep["w"].sharding.num_devices == 8


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("synthdp")
    return make_synthetic_dataset(str(root), n_patients=32, dim=256,
                                  min_regions=4, max_regions=12, seed=9)


def test_adv_handler_dp8(synth, tmp_path):
    from advmil_tpu.train.handler import AdvHandler
    cfg = base_cfg(synth, tmp_path, epochs=2, dp_devices=8,
                   bcb_dims="256-32-32", gen_dims="32-1",
                   disc_netx_in_dim=256, disc_netx_out_dim=16,
                   disc_nety_hid_dims="8-16", times_test_sample=2,
                   batch_token_budget=8192)
    handler = AdvHandler(cfg)
    metrics = handler.exec()
    assert np.isfinite(dict(metrics["validation"])["cindex"])


def test_dp_batcher_rounds_to_device_multiple(synth, tmp_path):
    from advmil_tpu.data.bags import BagDataset, BucketBatcher
    ds = BagDataset([p for p in synth["pids"]], synth["path_patch"],
                    synth["path_label"], "abmil", read_format="npy",
                    time_format="ratio")
    b = BucketBatcher(ds, token_budget=4096, min_bucket=256, batch_multiple=8)
    for n in [256, 512, 1024]:
        assert b.batch_size_for(n) % 8 == 0


def test_baseline_handler_dp8(synth, tmp_path):
    # single-host data parallelism in the BaselineHandler (mirrors the adv
    # handler's dp path)
    from advmil_tpu.train.baseline import BaselineHandler
    from tests.test_handlers_modes import baseline_cfg
    cfg = baseline_cfg(synth, tmp_path, dp_devices=8, epochs=2, es_warmup=0,
                       bcb_dims="256-64-64", disc_netx_in_dim=256)
    metrics = BaselineHandler(cfg).exec()
    import numpy as np
    assert np.isfinite(dict(metrics["validation"])["cindex"])
