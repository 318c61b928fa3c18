"""Optimizer factory tests: torch-parity for the coupled-L2 optimizers the
reference actually uses (Adam; reference model/model_handler.py:106-107), the
weight-decay exclusion mask, custom transforms, lookahead, plateau scheduler,
and adahessian grads."""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from advmil_tpu.train.optim import (create_optimizer, ReduceLROnPlateau,
                                    lookahead, adahessian_grads)

torch = pytest.importorskip("torch")


def _run_jax(tx, w0, grads_seq):
    w = {"w": jnp.asarray(w0)}
    state = tx.init(w)
    for g in grads_seq:
        updates, state = tx.update({"w": jnp.asarray(g)}, state, w)
        w = jax.tree_util.tree_map(lambda p, u: p + u, w, updates)
    return np.asarray(w["w"])


def _run_torch(opt_cls, w0, grads_seq, **kw):
    w = torch.nn.Parameter(torch.tensor(w0))
    opt = opt_cls([w], **kw)
    for g in grads_seq:
        opt.zero_grad()
        w.grad = torch.tensor(g)
        opt.step()
    return w.detach().numpy()


W0 = np.array([[0.5, -1.0], [2.0, 0.1]], np.float32)
GRADS = [np.array([[0.1, -0.2], [0.3, 0.05]], np.float32) * s
         for s in [1.0, -0.5, 2.0, 0.7, -1.2]]


def test_adam_matches_torch_with_coupled_l2():
    tx = create_optimizer("adam", 1e-2, weight_decay=0.0)
    got = _run_jax(tx, W0, GRADS)
    want = _run_torch(torch.optim.Adam, W0, GRADS, lr=1e-2)
    np.testing.assert_allclose(got, want, atol=1e-6)
    # coupled L2 (torch weight_decay semantics); no mask -> decay everything
    tx = create_optimizer("adam", 1e-2, weight_decay=0.01)
    got = _run_jax(tx, W0, GRADS)
    want = _run_torch(torch.optim.Adam, W0, GRADS, lr=1e-2, weight_decay=0.01)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_adamw_matches_torch():
    tx = create_optimizer("adamw", 1e-2, weight_decay=0.05)
    got = _run_jax(tx, W0, GRADS)
    want = _run_torch(torch.optim.AdamW, W0, GRADS, lr=1e-2, weight_decay=0.05)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_sgd_momentum_matches_torch():
    tx = create_optimizer("momentum", 1e-2, momentum=0.9)
    got = _run_jax(tx, W0, GRADS)
    want = _run_torch(torch.optim.SGD, W0, GRADS, lr=1e-2, momentum=0.9)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_weight_decay_mask_excludes_1d():
    params = {"w": jnp.ones((3, 3)), "b": jnp.ones((3,))}
    tx = create_optimizer("adam", 1e-2, weight_decay=0.5, params=params)
    state = tx.init(params)
    zero_g = jax.tree_util.tree_map(jnp.zeros_like, params)
    updates, _ = tx.update(zero_g, state, params)
    # decay makes the 2-d weight move; the 1-d bias must not
    assert float(jnp.abs(updates["w"]).sum()) > 0
    np.testing.assert_array_equal(np.asarray(updates["b"]), 0.0)


@pytest.mark.parametrize("name", ["adam", "adamw", "nadam", "radam", "adamp",
                                  "sgdp", "novograd", "nvnovograd", "rmsprop",
                                  "rmsproptf", "adadelta", "adafactor", "sgd",
                                  "nesterov", "momentum", "lookahead_adam"])
def test_factory_surface_runs(name):
    """Every reference factory name (optim/optim_factory.py:40-127) builds and
    takes a step that changes parameters."""
    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
    tx = create_optimizer(name, 1e-2, weight_decay=0.0, params=params)
    state = tx.init(params)
    g = jax.tree_util.tree_map(lambda p: jnp.ones_like(p) * 0.1, params)
    updates, state = tx.update(g, state, params)
    new = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
    assert float(jnp.abs(new["w"] - params["w"]).sum()) > 0


def test_unknown_name_raises():
    with pytest.raises(ValueError):
        create_optimizer("nope", 1e-3)
    with pytest.raises(NotImplementedError):
        create_optimizer("adahessian", 1e-3)


def test_lookahead_sync():
    inner = optax.sgd(0.1)
    tx = lookahead(inner, sync_period=2, alpha=0.5)
    params = {"w": jnp.asarray([1.0, 1.0])}
    state = tx.init(params)
    g = {"w": jnp.asarray([1.0, 1.0])}
    # step 1 (no sync): fast = 1 - 0.1 = 0.9
    u, state = tx.update(g, state, params)
    params = jax.tree_util.tree_map(lambda p, uu: p + uu, params, u)
    np.testing.assert_allclose(np.asarray(params["w"]), 0.9, rtol=1e-6)
    # step 2 (sync): fast' = 0.8; slow = 1 + 0.5*(0.8-1) = 0.9 -> params = 0.9
    u, state = tx.update(g, state, params)
    params = jax.tree_util.tree_map(lambda p, uu: p + uu, params, u)
    np.testing.assert_allclose(np.asarray(params["w"]), 0.9, rtol=1e-6)


def test_plateau_scheduler():
    sch = ReduceLROnPlateau(factor=0.5, patience=2)
    scales = [sch.step(1.0) for _ in range(10)]
    # best=1.0 at step 1; steps 2,3 bad; step 4 (3rd bad) triggers
    assert scales[0] == 1.0
    assert min(scales) < 1.0
    sch2 = ReduceLROnPlateau(factor=0.5, patience=2)
    for v in [1.0, 0.9, 0.8, 0.7, 0.6]:
        assert sch2.step(v) == 1.0  # steady improvement never decays


def test_adahessian_grads_quadratic():
    """For f(w) = 0.5 * w^T diag(d) w, the Hutchinson estimate's expectation is
    diag(d); with a single rademacher draw on a diagonal Hessian it is exact."""
    d = jnp.asarray([1.0, 4.0, 9.0])

    def loss(params):
        return 0.5 * jnp.sum(d * params["w"] ** 2)

    params = {"w": jnp.asarray([1.0, 1.0, 1.0])}
    val, grads, hdiag = adahessian_grads(loss, params, jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(grads["w"]), np.asarray(d), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(hdiag["w"]), np.asarray(d), rtol=1e-5)


def test_adahessian_optimizer_step():
    """Full AdaHessian transform on a quadratic: preconditioning by the exact
    Hessian diag makes one step move each coordinate by ~lr (Newton-like)."""
    from advmil_tpu.train.optim import adahessian, adahessian_grads
    d = jnp.asarray([1.0, 4.0, 9.0])

    def loss(params):
        return 0.5 * jnp.sum(d * params["w"] ** 2)

    params = {"w": jnp.asarray([1.0, 1.0, 1.0])}
    tx = adahessian(0.1, b1=0.0, b2=0.0)
    state = tx.init(params)
    _, grads, hdiag = adahessian_grads(loss, params, jax.random.PRNGKey(0))
    updates, state = tx.update(grads, state, params, hessian_diag=hdiag)
    # m/sqrt(h^2) = d*w / d = w -> update = -lr * w = -0.1 everywhere
    np.testing.assert_allclose(np.asarray(updates["w"]), -0.1, rtol=1e-5)


def test_baseline_handler_adahessian(tmp_path):
    from advmil_tpu.data.synthetic import make_synthetic_dataset
    from advmil_tpu.train.baseline import BaselineHandler
    from tests.test_train_smoke import base_cfg
    from tests.test_handlers_modes import baseline_cfg
    paths = make_synthetic_dataset(str(tmp_path / "d"), n_patients=24, dim=64,
                                   min_regions=2, max_regions=4, seed=6,
                                   event_frac=0.9)
    cfg = baseline_cfg(paths, tmp_path, opt_net="adahessian",
                       bcb_dims="64-16-16", pdh_dims="16-1",
                       disc_netx_in_dim=64, disc_netx_out_dim=8,
                       disc_nety_hid_dims="4-8", epochs=2)
    metrics = BaselineHandler(cfg).exec()
    assert np.isfinite(dict(metrics["validation"])["cindex"])


@pytest.mark.parametrize("name,wd", [("adam", 5e-4), ("adam", 0.0),
                                     ("adamw", 1e-2), ("sgd", 1e-4),
                                     ("rmsproptf", 0.0), ("radam", 1e-3),
                                     ("lookahead_adam", 5e-4)])
def test_flatten_is_exact(name, wd):
    """opt_flatten runs elementwise optimizers on one concatenated vector —
    must be bit-identical to the per-leaf build, including the 1-d
    weight-decay exclusion mask (optim.py _flat_decay)."""
    rng = np.random.default_rng(0)
    params = {"a": {"w": jnp.asarray(rng.normal(size=(8, 16)), jnp.float32),
                    "b": jnp.asarray(rng.normal(size=(16,)), jnp.float32)},
              "c": jnp.asarray(rng.normal(size=(16, 4)), jnp.float32)}
    grads = jax.tree_util.tree_map(
        lambda p: jnp.asarray(rng.normal(size=p.shape), jnp.float32), params)
    tx_f = create_optimizer(name, 1e-3, weight_decay=wd, params=params,
                            flatten=True)
    tx_u = create_optimizer(name, 1e-3, weight_decay=wd, params=params,
                            flatten=False)
    sf, su = tx_f.init(params), tx_u.init(params)
    pf = pu = params
    for _ in range(7):  # crosses a lookahead sync boundary (period 6)
        uf, sf = tx_f.update(grads, sf, pf)
        uu, su = tx_u.update(grads, su, pu)
        pf = optax.apply_updates(pf, uf)
        pu = optax.apply_updates(pu, uu)
    for a, b in zip(jax.tree_util.tree_leaves(pf),
                    jax.tree_util.tree_leaves(pu)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_flatten_skips_per_tensor_optimizers():
    """adamp's projection is per-tensor: flatten must leave it unflattened
    (state pytree keeps per-leaf structure)."""
    params = {"w": jnp.ones((4, 4)), "b": jnp.ones((4,))}
    tx = create_optimizer("adamp", 1e-3, weight_decay=1e-4, params=params,
                          flatten=True)
    state = tx.init(params)
    leaves = jax.tree_util.tree_leaves(state)
    # per-leaf mu/nu survive (flattened state would hold single 20-el vectors)
    assert any(l.shape == (4, 4) for l in leaves if hasattr(l, "shape"))


def test_reset_multisteps_accum_drops_partial_remainder():
    """accum_drop_remainder regime: zeroing the MultiSteps accumulator at an
    epoch boundary must make training identical to never having fed the
    trailing partial micro-batches (reference drops its trailing
    < bp_every_batch bags without a step, baseline_handler.py:296-324)."""
    from advmil_tpu.train.optim import reset_multisteps_accum

    params = {"w": jnp.asarray(W0)}
    k = 4

    def make():
        tx = optax.MultiSteps(optax.adam(1e-2), every_k_schedule=k)
        return tx, tx.init(params)

    # arm A: full group of k, then 2 trailing grads, reset, another full group
    tx, sa = make()
    pa = params
    seq_a = GRADS[:k] + GRADS[:2] + ["RESET"] + GRADS[1:1 + k]
    for g in seq_a:
        if isinstance(g, str):
            sa = reset_multisteps_accum(sa)
            continue
        u, sa = tx.update({"w": jnp.asarray(g)}, sa, pa)
        pa = optax.apply_updates(pa, u)

    # arm B: same stream with the trailing partial grads simply absent
    tx, sb = make()
    pb = params
    for g in GRADS[:k] + GRADS[1:1 + k]:
        u, sb = tx.update({"w": jnp.asarray(g)}, sb, pb)
        pb = optax.apply_updates(pb, u)

    np.testing.assert_array_equal(np.asarray(pa["w"]), np.asarray(pb["w"]))
    # gradient_step (inner step count) survived the reset
    assert int(sa.gradient_step) == int(sb.gradient_step) == 2


def test_reset_multisteps_accum_noop_without_multisteps():
    """No MultiSteps in the tree -> state returned structurally unchanged."""
    from advmil_tpu.train.optim import reset_multisteps_accum

    params = {"w": jnp.ones((3,))}
    tx = optax.adam(1e-3)
    state = tx.init(params)
    out = reset_multisteps_accum(state)
    for a, b in zip(jax.tree_util.tree_leaves(out),
                    jax.tree_util.tree_leaves(state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
