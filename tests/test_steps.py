"""Train-step unit tests: dummy-bag invariance (appending sample_mask=0 filler
bags must not change parameter updates), stop-gradient correctness, label
visibility, and gen_updates handling."""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from advmil_tpu.models.backbones import ABMIL
from advmil_tpu.models.gan import Generator, PrjDiscriminator
from advmil_tpu.train.steps import (AdvTrainState, make_adv_train_step,
                                    make_supervised_loss)
from advmil_tpu.train.optim import create_optimizer

RNG = np.random.default_rng(33)
C = 64


def _models():
    bb = ABMIL((C, 32, 32))
    gen = Generator(backbone=bb, dim_in=32, dim_out=1, noise=(0, 1), hops=1,
                    dropout=0.25)
    disc = PrjDiscriminator(netx_in_dim=C, netx_out_dim=16, nety_in_dim=1,
                            nety_hid_dims=(8, 16), prj_path="x",
                            inner_product="instance")
    return gen, disc


def _state(gen, disc, feats, mask):
    key = jax.random.PRNGKey(0)
    pG = gen.init({"params": key, "noise": key, "dropout": key},
                  feats[:1], mask[:1], None, zero_noise=True,
                  deterministic=True)["params"]
    pD = disc.init({"params": key, "dropout": key}, feats[:1],
                   jnp.zeros((1, 1)), mask[:1], deterministic=True)["params"]
    tx_G = create_optimizer("adam", 1e-3, weight_decay=0.0, params=pG)
    tx_D = optax.adam(1e-3)
    return (AdvTrainState(params_G=pG, params_D=pD, opt_G=tx_G.init(pG),
                          opt_D=tx_D.init(pD), rng=key), tx_G, tx_D)


def _batch(B, N, sample_mask=None, visible=None):
    feats = jnp.asarray(RNG.normal(size=(B, N, C)), jnp.float32)
    mask = jnp.ones((B, N), jnp.float32)
    t = jnp.asarray(RNG.uniform(0.1, 1.0, size=(B,)), jnp.float32)
    e = jnp.asarray([1.0, 0.0, 1.0, 1.0][:B] + [1.0] * max(0, B - 4))
    return {"feats": feats, "mask": mask, "label": jnp.stack([t, e], axis=1),
            "sample_mask": (jnp.ones((B,)) if sample_mask is None
                            else jnp.asarray(sample_mask, jnp.float32)),
            "visible": (jnp.ones((B,)) if visible is None
                        else jnp.asarray(visible, jnp.float32))}


def _make_step(gen, disc, tx_G, tx_D, gen_updates=1):
    cfg = {"loss_recon_alpha": 0.0, "loss_recon_gamma": 0.0,
           "loss_recon_norm": "l1"}
    return make_adv_train_step(
        gen, disc, tx_G, tx_D, task="cont_gansurv", bcb_mode="abmil",
        loss_netD="bce", coef_gan=0.004, l1_coef=0.0, gen_updates=gen_updates,
        nbins=4, sup_loss_fn=make_supervised_loss("cont_gansurv", cfg),
        donate=False)


def test_dummy_bag_invariance():
    """Appending filler bags with sample_mask=0 must give identical updates —
    the core contract letting ragged tails be padded with duplicates.

    Caveat handled: per-batch RNG draws must line up, so the filler comparison
    uses the same noise keys (the step derives them from state.rng which is
    identical in both runs); noise shape [B, d] differs with B, so we compare
    against a filler bag that duplicates bag 0 (as the batcher does) and only
    require the REAL bags' effect on parameters to match in expectation terms:
    here exactly, because all reductions are weighted by sample_mask and the
    noise entering dummy rows never touches the loss."""
    gen, disc = _models()
    B, N = 3, 32
    batch = _batch(B, N)
    state, tx_G, tx_D = _state(gen, disc, batch["feats"], batch["mask"])
    step = _make_step(gen, disc, tx_G, tx_D)
    s1, m1, _ = step(state, batch)

    # same bags + 1 duplicated filler with sample_mask 0
    batch2 = {
        "feats": jnp.concatenate([batch["feats"], batch["feats"][:1]], 0),
        "mask": jnp.concatenate([batch["mask"], batch["mask"][:1]], 0),
        "label": jnp.concatenate([batch["label"], batch["label"][:1]], 0),
        "sample_mask": jnp.asarray([1, 1, 1, 0], jnp.float32),
        "visible": jnp.asarray([1, 1, 1, 0], jnp.float32),
    }
    s2, m2, _ = step(state, batch2)
    # loss values must be identical (weighted means ignore the filler)
    np.testing.assert_allclose(float(m1["Loss_D"]), float(m2["Loss_D"]),
                               rtol=2e-5)
    # NOTE: parameter updates differ only through the per-batch noise draw
    # (shape [B, d] vs [B+1, d] consumes the key differently); loss equality
    # plus the masked-loss unit tests pin the semantics.


def test_dummy_bag_invariance_zero_noise_exact():
    """With noise disabled the padded batch must produce bit-equal updates."""
    bb = ABMIL((C, 32, 32))
    gen = Generator(backbone=bb, dim_in=32, dim_out=1, noise=(0, 0), hops=1,
                    dropout=0.0)
    disc = PrjDiscriminator(netx_in_dim=C, netx_out_dim=16, nety_in_dim=1,
                            nety_hid_dims=(8, 16), prj_path="x",
                            inner_product="instance", netx_dropout=0.0)
    B, N = 3, 32
    batch = _batch(B, N)
    state, tx_G, tx_D = _state(gen, disc, batch["feats"], batch["mask"])
    step = _make_step(gen, disc, tx_G, tx_D)
    s1, _, _ = step(state, batch)
    batch2 = {
        "feats": jnp.concatenate([batch["feats"], batch["feats"][:1]], 0),
        "mask": jnp.concatenate([batch["mask"], batch["mask"][:1]], 0),
        "label": jnp.concatenate([batch["label"], batch["label"][:1]], 0),
        "sample_mask": jnp.asarray([1, 1, 1, 0], jnp.float32),
        "visible": jnp.asarray([1, 1, 1, 0], jnp.float32),
    }
    s2, _, _ = step(state, batch2)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params_G),
                    jax.tree_util.tree_leaves(s2.params_G)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params_D),
                    jax.tree_util.tree_leaves(s2.params_D)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_step_updates_both_nets_and_visibility():
    gen, disc = _models()
    B, N = 4, 32
    batch = _batch(B, N)
    state, tx_G, tx_D = _state(gen, disc, batch["feats"], batch["mask"])
    step = _make_step(gen, disc, tx_G, tx_D)
    s1, metrics, collect = step(state, batch)
    # both nets moved
    diff_G = sum(float(jnp.abs(a - b).sum()) for a, b in zip(
        jax.tree_util.tree_leaves(s1.params_G),
        jax.tree_util.tree_leaves(state.params_G)))
    diff_D = sum(float(jnp.abs(a - b).sum()) for a, b in zip(
        jax.tree_util.tree_leaves(s1.params_D),
        jax.tree_util.tree_leaves(state.params_D)))
    assert diff_G > 0 and diff_D > 0
    assert np.isfinite(float(metrics["Loss_D"]))
    assert collect["y_hat"].shape == (B, 1)
    # all labels hidden -> supervised loss is exactly 0
    batch_novis = dict(batch)
    batch_novis["visible"] = jnp.zeros((B,))
    _, m2, _ = step(state, batch_novis)
    assert float(m2["Loss_G_time"]) == 0.0


def test_gen_updates_two():
    gen, disc = _models()
    B, N = 2, 32
    batch = _batch(B, N)
    state, tx_G, tx_D = _state(gen, disc, batch["feats"], batch["mask"])
    step1 = _make_step(gen, disc, tx_G, tx_D, gen_updates=1)
    step2 = _make_step(gen, disc, tx_G, tx_D, gen_updates=2)
    s1, _, _ = step1(state, batch)
    s2, _, _ = step2(state, batch)
    # two G updates move G further than one (same D trajectory)
    d1 = sum(float(jnp.abs(a - b).sum()) for a, b in zip(
        jax.tree_util.tree_leaves(s1.params_G),
        jax.tree_util.tree_leaves(state.params_G)))
    d2 = sum(float(jnp.abs(a - b).sum()) for a, b in zip(
        jax.tree_util.tree_leaves(s2.params_G),
        jax.tree_util.tree_leaves(state.params_G)))
    assert d2 > d1 * 1.2


def test_eval_step_embed_head_split_matches_full_forward():
    # serving path: make_eval_step embeds the backbone once and vmaps only
    # the noise head over sample keys; each sample must equal a FULL
    # generator forward with the same noise key (the split is an
    # optimization, not a semantic change).
    # The bitwise vmap==loop identity holds for threefry keys only — the
    # rbg generator (the shipped rng_impl default) draws different (still
    # independent, deterministic) bits under vmap than under a python loop,
    # a documented JAX property — so this exactness claim pins threefry
    # keys explicitly; rbg-regime determinism is asserted separately below.
    from advmil_tpu.train.steps import make_eval_step, _median_lower
    gen, disc = _models()
    B, N, K = 3, 32, 5
    batch = _batch(B, N)
    state, _, _ = _state(gen, disc, batch["feats"], batch["mask"])
    step = make_eval_step(gen, disc, bcb_mode="abmil", n_samples=K)
    rng = jax.random.key(7, impl="threefry2x32")  # typed: carries its impl
    out = step(state.params_G, state.params_D, batch, rng)
    assert out["dist_y_hat"].shape == (B, K, 1)

    k0, kdist = jax.random.split(rng)
    keys = jax.random.split(kdist, K)
    full = jnp.stack([
        gen.apply({"params": state.params_G}, batch["feats"], batch["mask"],
                  None, zero_noise=False, deterministic=True,
                  rngs={"noise": k})
        for k in keys])                                   # [K, B, 1]
    np.testing.assert_allclose(np.asarray(out["dist_y_hat"]),
                               np.asarray(jnp.transpose(full, (1, 0, 2))),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["avg_y_hat"]),
                               np.asarray(_median_lower(full, axis=0)),
                               rtol=1e-5, atol=1e-6)
    # y_hat itself is the k0 sample of a full forward
    y0 = gen.apply({"params": state.params_G}, batch["feats"], batch["mask"],
                   None, zero_noise=False, deterministic=True,
                   rngs={"noise": k0})
    np.testing.assert_allclose(np.asarray(out["y_hat"]), np.asarray(y0),
                               rtol=1e-5, atol=1e-6)
    # rbg regime (shipped default): the vmapped samples are not the loop's
    # bits, but they must be deterministic given the key and mutually
    # distinct (independent sample draws, not one broadcast stream)
    rng_rbg = jax.random.key(7, impl="rbg")
    out_a = step(state.params_G, state.params_D, batch, rng_rbg)
    out_b = step(state.params_G, state.params_D, batch, rng_rbg)
    np.testing.assert_array_equal(np.asarray(out_a["dist_y_hat"]),
                                  np.asarray(out_b["dist_y_hat"]))
    d = np.asarray(out_a["dist_y_hat"])[0, :, 0]          # K samples, bag 0
    assert len(np.unique(d.round(6))) == K
