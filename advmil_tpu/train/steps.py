"""Jitted training and evaluation steps.

The reference's hot loop (reference model/model_handler.py:301-498) is 16
single-bag forwards + a D step, then 16 more + a G step, all eager. Here the
whole thing is ONE jitted function per bucket shape: a batched D update and
``gen_updates`` batched G updates with two optax states, masks carrying the
event/label-visibility/padding structure, and lax.stop_gradient in place of
.detach(). Phase-dependent determinism mirrors the reference's train()/eval()
mode flips: the D step sees dropout-on D / dropout-off G, the G step the
opposite (reference model/model_handler.py:355-356,432-433).
"""
from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from .. import losses


@struct.dataclass
class AdvTrainState:
    params_G: Any
    params_D: Any
    opt_G: Any
    opt_D: Any
    rng: jax.Array


@struct.dataclass
class BaseTrainState:
    params: Any
    opt: Any
    rng: jax.Array


def _gen_extra(batch: dict, bcb_mode: str):
    if bcb_mode == "cluster":
        return batch["cluster_id"]
    if bcb_mode == "graph":
        # with banded streaming the batcher ships only band/residual tables
        # (no dense edge tables reach the device); otherwise edge_src /
        # edge_mask and optionally the scatter-free reverse tables
        extra = {}
        for k in ("edge_src", "edge_mask", "rev_idx", "rev_mask",
                  "band_offs", "band_mask", "res_node", "res_src",
                  "res_mask", "band_urows", "band_usrc", "band_uemask",
                  "band_uinv", "band_gidx"):
            if k in batch:
                extra[k] = batch[k]
        return extra
    if bcb_mode == "patch":
        return batch.get("coords")  # None unless coords supplied
    return None


def make_supervised_loss(task: str, cfg: dict):
    """Bind the task's supervised loss with its config (reference
    model/model_handler.py:95-98)."""
    if task == "cont_gansurv" or task == "surv_reg":
        alpha = cfg.get("loss_recon_alpha", 0.0) or 0.0
        gamma = cfg.get("loss_recon_gamma", 1.0)
        norm = cfg.get("loss_recon_norm", "l1")
        return functools.partial(losses.recon_loss, alpha=alpha, gamma=gamma,
                                 norm=norm)
    if task == "disc_gansurv" or task == "surv_nll":
        alpha = cfg.get("loss_mle_alpha", 0.0) or 0.0
        return functools.partial(losses.surv_mle_loss, alpha=alpha)
    if task == "surv_cox":
        return losses.surv_ple_loss
    if task == "surv_mse":
        return functools.partial(losses.mse_loss,
                                 include_censored=cfg.get("loss_use_censored", False))
    raise ValueError(f"unknown task {task}")


def make_adv_train_step(gen_model, disc_model, tx_G, tx_D, *, task: str,
                        bcb_mode: str, loss_netD: str, coef_gan: float,
                        l1_coef: float, gen_updates: int, nbins: int,
                        sup_loss_fn, donate: bool = True):
    """Build the fused adversarial step: D update then gen_updates G updates.

    batch dict: feats [B,N,C], mask [B,N], label [B,2], sample_mask [B],
    visible [B] (+ mode extras). Returns (state, metrics, collect) where
    collect carries the D-phase predictions/fake-scores the reference logs as
    training-set predictions (reference model/model_handler.py:333-339).
    """
    is_disc_task = task == "disc_gansurv"

    def step(state: AdvTrainState, batch: dict):
        rng, kD_noise, kD_drop = jax.random.split(state.rng, 3)
        feats, mask = batch["feats"], batch["mask"]
        t = batch["label"][:, 0]
        e = batch["label"][:, 1]
        smask = batch["sample_mask"]
        visible = batch["visible"] * smask
        extra = _gen_extra(batch, bcb_mode)

        if is_disc_task:
            # PARITY QUIRK: the reference passes the EVENT indicator into
            # get_label_mask's censorship parameter (model_handler.py:382
            # calls get_label_mask(t, data_ind, bins) where func.py:59 treats
            # arg 2 as c), so events get label (z > t) and censored get
            # one-hot(z == t). Passing (1 - e) here reproduces that behavior.
            y_disc, y_mask = losses.get_label_mask(t, 1.0 - e, nbins)
        else:
            y_disc = y_mask = None

        # ---- D phase: generator in eval mode (dropout off, noise on) ----
        pred_eval = gen_model.apply({"params": state.params_G}, feats, mask,
                                    extra, zero_noise=False, deterministic=True,
                                    rngs={"noise": kD_noise})
        pred_detached = jax.lax.stop_gradient(pred_eval)

        # independent dropout masks for the real and fake D forwards (the
        # reference's two train-mode netD calls each draw fresh masks) come
        # from per-pair rng folds inside the single pair-batched call
        kD_drop_real = kD_drop

        def d_loss_fn(params_D):
            if is_disc_task:
                t_real = y_disc * y_mask
                real_w = smask  # visibility not gated for disc-task real pairs
                fake_in = pred_detached * y_mask
            else:
                t_real = t[:, None]
                real_w = (e == 1).astype(jnp.float32) * visible
                fake_in = pred_detached
            # one pair-batched call: the dropout-free netx patch embedding is
            # a single shared jaxpr node (one feats read fwd, one merged dW
            # bwd — BENCHNOTES round-4 roofline), while every dropout layer
            # still draws independent masks per pair element
            f_real, f_fake = disc_model.apply(
                {"params": params_D}, feats, (t_real, fake_in), mask,
                deterministic=False, rngs={"dropout": kD_drop_real})
            f_real = f_real.astype(jnp.float32)
            f_fake = f_fake.astype(jnp.float32)
            loss = losses.real_fake_loss(f_real, f_fake, which=loss_netD,
                                         real_weight=real_w, fake_weight=smask)
            aux = {"f_real": f_real, "f_fake": f_fake, "real_w": real_w}
            return loss, aux

        (dis_loss, d_aux), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            state.params_D)
        d_updates, opt_D = tx_D.update(d_grads, state.opt_D, state.params_D)
        params_D = jax.tree_util.tree_map(lambda p, u: p + u, state.params_D,
                                          d_updates)

        # ---- G phase (x gen_updates): D in eval mode, G in train mode ----
        params_G, opt_G = state.params_G, state.opt_G
        g_metrics = {}
        for i in range(gen_updates):
            rng, kG_noise, kG_drop = jax.random.split(rng, 3)

            def g_loss_fn(pG):
                pred = gen_model.apply({"params": pG}, feats, mask, extra,
                                       zero_noise=False, deterministic=False,
                                       rngs={"noise": kG_noise, "dropout": kG_drop})
                fake_in = pred * y_mask if is_disc_task else pred
                f_fake = disc_model.apply({"params": params_D}, feats, fake_in,
                                          mask,
                                          deterministic=True).astype(jnp.float32)
                gen_loss = losses.fake_generator_loss(f_fake, weight=smask)
                t_reg = sup_loss_fn(pred[:, 0] if not is_disc_task else pred,
                                    t, e, weight=visible)
                total = t_reg if coef_gan == 0.0 else t_reg + coef_gan * gen_loss
                total = total + losses.loss_reg_l1(pG, l1_coef)
                return total, {"gen_loss": gen_loss, "t_reg": t_reg,
                               "f_fake_mean": losses._wmean(f_fake.reshape(-1), smask)}

            (g_total, g_aux), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
                params_G)
            g_updates, opt_G = tx_G.update(g_grads, opt_G, params_G)
            params_G = jax.tree_util.tree_map(lambda p, u: p + u, params_G,
                                              g_updates)
            g_metrics = {"Loss_G_fake": g_aux["gen_loss"],
                         "Loss_G_time": g_aux["t_reg"],
                         "Loss_G_total": g_total,
                         "D_fake_avg": g_aux["f_fake_mean"]}

        metrics = {"Loss_D": dis_loss,
                   "D_real": losses._wmean(d_aux["f_real"].reshape(-1),
                                           d_aux["real_w"]),
                   "D_fake": losses._wmean(d_aux["f_fake"].reshape(-1), smask)}
        metrics.update(g_metrics)
        collect = {"y_hat": pred_eval, "f_fake": d_aux["f_fake"].reshape(-1)}
        new_state = AdvTrainState(params_G=params_G, params_D=params_D,
                                  opt_G=opt_G, opt_D=opt_D, rng=rng)
        return new_state, metrics, collect

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_base_train_step(model, tx, *, task: str, bcb_mode: str, l1_coef: float,
                         sup_loss_fn, donate: bool = True,
                         second_order: bool = False):
    """Baseline (non-adversarial) step (reference
    model/baseline_handler.py:328-368): one supervised update per batch.

    ``second_order=True`` feeds a Hutchinson Hessian-diagonal estimate to the
    optimizer as the extra ``hessian_diag`` arg (AdaHessian; the JAX analogue
    of the reference's create_graph backward, optim/adahessian.py)."""
    is_disc_task = task == "surv_nll"

    def step(state: BaseTrainState, batch: dict):
        rng, k_drop, k_hvp = jax.random.split(state.rng, 3)
        feats, mask = batch["feats"], batch["mask"]
        t = batch["label"][:, 0]
        e = batch["label"][:, 1]
        smask = batch["sample_mask"]
        extra = _gen_extra(batch, bcb_mode)

        def loss_fn(params):
            pred = model.apply({"params": params}, feats, mask, extra,
                               deterministic=False, rngs={"dropout": k_drop})
            loss = sup_loss_fn(pred if is_disc_task else pred[:, 0], t, e,
                               weight=smask)
            total = loss + losses.loss_reg_l1(params, l1_coef)
            return total, {"net_loss": loss, "pred": pred}

        if second_order:
            from .optim import adahessian_grads
            (total, aux), grads, hdiag = adahessian_grads(
                loss_fn, state.params, k_hvp, has_aux=True)
            updates, opt = tx.update(grads, state.opt, state.params,
                                     hessian_diag=hdiag)
        else:
            (total, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params)
            updates, opt = tx.update(grads, state.opt, state.params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, state.params, updates)
        metrics = {"loss_supervision": aux["net_loss"], "loss_total": total}
        collect = {"y_hat": aux["pred"]}
        return BaseTrainState(params=params, opt=opt, rng=rng), metrics, collect

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def _median_lower(x, axis=0):
    """torch.median semantics: the lower of the two middle order statistics
    (reference model/model_handler.py:639 uses torch.median over 30 samples)."""
    k = x.shape[axis]
    sorted_x = jnp.sort(x, axis=axis)
    return jnp.take(sorted_x, (k - 1) // 2, axis=axis)


def make_eval_step(gen_model, disc_model=None, *, bcb_mode: str,
                   n_samples: int = 1, zero_noise: bool = False):
    """Evaluation step (reference model/model_handler.py:598-643): one forward
    for y_hat (+ f_fake if a discriminator is given); when n_samples > 1, the
    sampling distribution vmaps only the noise head over sample keys (the
    backbone embedding is computed once — noise never enters it), reduced by
    the lower median. Replaces the reference's 30x full-forward Python loop.
    """
    has_embed_head = hasattr(gen_model, "embed") and hasattr(gen_model, "head")

    def step(params_G, params_D, batch: dict, rng):
        feats, mask = batch["feats"], batch["mask"]
        extra = _gen_extra(batch, bcb_mode)
        k0, kdist = jax.random.split(rng)
        if has_embed_head:
            H = gen_model.apply({"params": params_G}, feats, mask, extra,
                                deterministic=True, method=gen_model.embed)

            def sample(key):
                return gen_model.apply({"params": params_G}, H,
                                       zero_noise=zero_noise, deterministic=True,
                                       rngs={"noise": key},
                                       method=gen_model.head)

            y_hat = sample(k0)
        else:
            def sample(key):
                return gen_model.apply({"params": params_G}, feats, mask, extra,
                                       zero_noise=zero_noise, deterministic=True,
                                       rngs={"noise": key})

            y_hat = sample(k0)
        out = {"y_hat": y_hat}
        if disc_model is not None:
            out["f_fake"] = disc_model.apply(
                {"params": params_D}, feats, y_hat, mask,
                deterministic=True).astype(jnp.float32).reshape(-1)
        if n_samples > 1:
            keys = jax.random.split(kdist, n_samples)
            dist = jax.vmap(sample)(keys)               # [K, B, out]
            out["dist_y_hat"] = jnp.transpose(dist, (1, 0, 2))
            out["avg_y_hat"] = _median_lower(dist, axis=0)
        return out

    return jax.jit(step)
