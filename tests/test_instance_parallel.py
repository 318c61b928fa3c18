"""Instance-axis (sequence) parallelism: sharding the patch axis over an
'inst' mesh axis must not change results (GSPMD inserts the collectives).
Runs on the 8 virtual CPU devices as a 2x4 (data x inst) mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from advmil_tpu.models.backbones import ABMIL, DualTransHS
from advmil_tpu.parallel.mesh import make_mesh_2d, shard_batch_2d, replicate_state

RNG = np.random.default_rng(21)


def _setup(model, B=2, N=256, C=64):
    x = jnp.asarray(RNG.normal(size=(B, N, C)), jnp.float32)
    mask = np.ones((B, N), np.float32)
    mask[0, 192:] = 0  # ragged bag
    mask = jnp.asarray(mask)
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "dropout": key}, x, mask, None,
                           deterministic=True)
    return variables, x, mask


@pytest.mark.parametrize("model_cls,kw", [
    (ABMIL, {}),
    (DualTransHS, {"nhead": 4, "use_pallas": False}),
])
def test_instance_sharding_matches_unsharded(model_cls, kw):
    model = model_cls((64, 32, 32), **kw)
    variables, x, mask = _setup(model)
    want = model.apply(variables, x, mask, None, deterministic=True)

    mesh = make_mesh_2d(2, 4)
    batch = shard_batch_2d({"feats": np.asarray(x), "mask": np.asarray(mask)},
                           mesh)
    params = replicate_state(variables, mesh)

    @jax.jit
    def fwd(variables, feats, m):
        return model.apply(variables, feats, m, None, deterministic=True)

    got = fwd(params, batch["feats"], batch["mask"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_instance_sharding_grad_matches(model_cls=ABMIL):
    model = model_cls((64, 32, 32))
    variables, x, mask = _setup(model)

    def loss(variables, feats, m):
        return jnp.sum(model.apply(variables, feats, m, None,
                                   deterministic=True) ** 2)

    want = jax.grad(loss)(variables, x, mask)
    mesh = make_mesh_2d(2, 4)
    batch = shard_batch_2d({"feats": np.asarray(x), "mask": np.asarray(mask)},
                           mesh)
    params = replicate_state(variables, mesh)
    got = jax.jit(jax.grad(loss))(params, batch["feats"], batch["mask"])
    for g, w in zip(jax.tree_util.tree_leaves(got),
                    jax.tree_util.tree_leaves(want)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=3e-5)
