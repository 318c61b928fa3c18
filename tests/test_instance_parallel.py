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


def test_instance_sharding_graph_mode():
    # graph mode under the 2-D mesh: feats shard over 'inst' but the GNN
    # gathers reference global node indices — GSPMD must insert the
    # collectives and reproduce the unsharded result (edge tables ride the
    # data axis only, see parallel/mesh.shard_batch_2d)
    from advmil_tpu.models.backbones import PatchGCN
    model = PatchGCN((64, 32, 32), num_layers=2)
    B, N, epn = 2, 256, 4
    x = jnp.asarray(RNG.normal(size=(B, N, 64)), jnp.float32)
    mask = np.ones((B, N), np.float32)
    mask[0, 192:] = 0
    esrc = RNG.integers(0, 192, size=(B, N, epn)).astype(np.int32)
    em = np.ones((B, N, epn), np.float32)
    em[0, 192:] = 0
    extra = {"edge_src": jnp.asarray(esrc), "edge_mask": jnp.asarray(em)}
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "dropout": key}, x,
                           jnp.asarray(mask), extra, deterministic=True)
    want = model.apply(variables, x, jnp.asarray(mask), extra,
                       deterministic=True)

    mesh = make_mesh_2d(2, 4)
    batch = shard_batch_2d({"feats": np.asarray(x), "mask": mask,
                            "edge_src": esrc, "edge_mask": em}, mesh)
    params = replicate_state(variables, mesh)

    @jax.jit
    def fwd(v, feats, m, es, e):
        return model.apply(v, feats, m, {"edge_src": es, "edge_mask": e},
                           deterministic=True)

    got = fwd(params, batch["feats"], batch["mask"], batch["edge_src"],
              batch["edge_mask"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_attention_scores_stay_sharded_under_inst_mesh():
    """Sequence-parallel attention property (SURVEY.md §5 long-context):
    under an 'inst' mesh the einsum attention's [B, H, L, L] scores must stay
    query-row-sharded — GSPMD gathers only K/V, never materializing the full
    quadratic tensor per device. Asserted on the compiled HLO. (The flash
    kernel achieves the same decomposition explicitly via shard_map —
    masked_flash_attention_inst, tested below.)"""
    import re
    B, N, C, H = 2, 4096, 64, 8   # L = 256 regions
    model = DualTransHS((C, 64, 64), nhead=H, use_pallas=False)
    x = jnp.asarray(RNG.normal(size=(B, N, C)), jnp.float32)
    mask = jnp.ones((B, N), jnp.float32)
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "dropout": key}, x, mask, None,
                           deterministic=True)
    mesh = make_mesh_2d(1, 8)
    batch = shard_batch_2d({"feats": np.asarray(x), "mask": np.asarray(mask)},
                           mesh)
    params = replicate_state(variables, mesh)

    def loss(v, f, m):
        return jnp.sum(model.apply(v, f, m, None, deterministic=True) ** 2)

    hlo = (jax.jit(jax.grad(loss))
           .lower(params, batch["feats"], batch["mask"]).compile().as_text())
    L = N // 16
    full = re.findall(rf"f32\[{B},{H},{L},{L}\]", hlo)
    shard = re.findall(rf"f32\[{B},{H},{L // 8},{L}\]", hlo)
    assert not full, f"full scores tensor replicated per device: {len(full)}"
    assert shard, "expected query-row-sharded scores tensors in the HLO"


def test_effective_flash_min_len_no_longer_gates_under_inst():
    """Round 4: flash composes with instance sharding via the shard_map
    wrapper, so the length gate is mesh-independent (round 3 pushed it to
    1 << 30 under inst)."""
    from advmil_tpu.config import effective_flash_min_len
    assert effective_flash_min_len({"flash_min_len": 512}) == 512
    assert effective_flash_min_len(
        {"flash_min_len": 512, "inst_devices": 4}) == 512


# ---------------------------------------------------------------------------
# sequence-parallel flash attention (ops/attention.masked_flash_attention_inst)
# ---------------------------------------------------------------------------

def _qkvm(B=4, L=512, H=4, Dh=32, seed=5):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(B, L, H, Dh)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, L, H, Dh)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, L, H, Dh)), jnp.float32)
    mask = np.ones((B, L), np.float32)
    mask[0, 300:] = 0  # ragged bag: padding spans inst shards unevenly
    mask[2, 100:] = 0
    return q, k, v, jnp.asarray(mask)


def test_flash_inst_sharded_matches_reference():
    from advmil_tpu.ops.attention import (masked_flash_attention_inst,
                                          masked_attention_reference)
    q, k, v, mask = _qkvm()
    want = masked_attention_reference(q, k, v, mask)
    mesh = make_mesh_2d(2, 4)
    from jax.sharding import NamedSharding, PartitionSpec as P
    sh = NamedSharding(mesh, P("data", "inst"))
    qs, ks, vs = (jax.device_put(t, NamedSharding(mesh, P("data", "inst",
                                                          None, None)))
                  for t in (q, k, v))
    ms = jax.device_put(mask, sh)
    got = masked_flash_attention_inst(qs, ks, vs, ms, mesh, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_flash_inst_sharded_grads_match_reference():
    """dQ stays local; dK/dV are reduce-scattered by the all-gather
    transpose — all three must equal the einsum path's gradients."""
    from advmil_tpu.ops.attention import (masked_flash_attention_inst,
                                          masked_attention_reference)
    q, k, v, mask = _qkvm()
    w = jnp.asarray(np.random.default_rng(6).normal(size=q.shape), jnp.float32)
    mesh = make_mesh_2d(2, 4)

    def loss_ref(q, k, v):
        return jnp.sum(masked_attention_reference(q, k, v, mask) * w)

    def loss_inst(q, k, v):
        return jnp.sum(
            masked_flash_attention_inst(q, k, v, mask, mesh,
                                        interpret=True) * w)

    want = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    got = jax.jit(jax.grad(loss_inst, argnums=(0, 1, 2)))(q, k, v)
    for g, wgrad in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(wgrad),
                                   atol=3e-5, rtol=1e-3)


def test_transformer_routes_flash_through_inst_mesh(monkeypatch):
    """Module-level routing: with an inst mesh registered and the flash gate
    met, TransformerEncoderLayer must produce einsum-identical results via
    the shard_map'd kernel (ADVMIL_FLASH_INTERPRET=1 runs the kernels in
    interpret mode so this is CPU-checkable)."""
    monkeypatch.setenv("ADVMIL_FLASH_INTERPRET", "1")
    from advmil_tpu.models.layers import (TransformerEncoderLayer,
                                          set_inst_mesh)
    D, H, B, L = 32, 4, 4, 256
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(B, L, D)), jnp.float32)
    mask = np.ones((B, L), np.float32)
    mask[0, 150:] = 0
    mask = jnp.asarray(mask)
    flash_layer = TransformerEncoderLayer(D, H, D, dropout=0.0,
                                          use_pallas=True, flash_min_len=128)
    einsum_layer = TransformerEncoderLayer(D, H, D, dropout=0.0,
                                           use_pallas=False)
    key = jax.random.PRNGKey(0)
    variables = einsum_layer.init({"params": key, "dropout": key}, x, mask,
                                  deterministic=True)
    want = einsum_layer.apply(variables, x, mask, deterministic=False,
                              rngs={"dropout": key})
    mesh = make_mesh_2d(2, 4)
    set_inst_mesh(mesh)
    try:
        got = flash_layer.apply(variables, x, mask, deterministic=False,
                                rngs={"dropout": key})
    finally:
        set_inst_mesh(None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
