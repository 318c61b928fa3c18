"""Benchmark: GANSurv adversarial train-step throughput (WSI bags/sec/chip).

Workload mirrors the reference's documented scale (reference
model_stats.py:100-103: patient 128599 has 3360 patches at 20x -> 210 regions
after the 16x avg-pool): ESAT/DualTrans generator (1024-384-384) + RLIP
projection discriminator, full adversarial D+G update per step, bf16 compute
(f32 params/losses), B=32 padded bags per fused step.

Timing is the MARGINAL per-step cost between a short and a long chained run,
each terminated by a host fetch of an updated parameter leaf — robust against
async-dispatch runtimes where block_until_ready can return early.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no throughput numbers (BASELINE.md). We
anchor against a documented estimate of the PyTorch reference's training rate
on its own 2xV100 hardware: batch_size=1 eager loop, ~3 G forwards + 3 D
forwards + 2 backwards per bag at N~3360 => ~100 bags/sec is a generous upper
estimate for the eager B=1 pipeline (kernel-launch bound). This constant is an
ESTIMATE to be replaced by a measured anchor when GPU hardware is available.
"""
import json
import time

import numpy as np

REF_2XV100_BAGS_PER_SEC_ESTIMATE = 100.0

BAG_N = 3392          # ~reference patient scale, multiple of 16
FEAT_DIM = 1024
BATCH = 32
CHAIN_SHORT = 5
CHAIN_LONG = 25


def main():
    import jax
    import jax.numpy as jnp
    import optax
    from advmil_tpu.config import enable_compilation_cache
    enable_compilation_cache({"xla_cache_dir": "~/.cache/advmil-tpu/xla"})
    from advmil_tpu.models.layers import set_compute_dtype
    set_compute_dtype("bf16")
    from advmil_tpu.models.backbones import load_backbone
    from advmil_tpu.models.gan import Generator, PrjDiscriminator
    from advmil_tpu.train.steps import (AdvTrainState, make_adv_train_step,
                                        make_supervised_loss)
    from advmil_tpu.train.optim import create_optimizer

    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(BATCH, BAG_N, FEAT_DIM)), jnp.bfloat16)
    mask = jnp.ones((BATCH, BAG_N), jnp.float32)
    t = jnp.asarray(rng.uniform(0.1, 1.0, size=(BATCH,)), jnp.float32)
    e = jnp.asarray((rng.uniform(size=BATCH) < 0.65), jnp.float32)
    batch = {"feats": feats, "mask": mask,
             "label": jnp.stack([t, e], axis=1),
             "sample_mask": jnp.ones((BATCH,), jnp.float32),
             "visible": jnp.ones((BATCH,), jnp.float32)}

    backbone = load_backbone("patch", [1024, 384, 384], use_pallas=True)
    gen = Generator(backbone=backbone, dim_in=384, dim_out=1, noise=(0, 1),
                    hops=1, noise_dist="uniform", norm=False, dropout=0.6,
                    out_scale="sigmoid")
    disc = PrjDiscriminator(netx_in_dim=1024, netx_out_dim=128, nety_in_dim=1,
                            nety_hid_dims=(64, 128), prj_path="x",
                            inner_product="instance", netx_ksize=1,
                            netx_dropout=0.25)
    key = jax.random.PRNGKey(0)
    params_G = gen.init({"params": key, "noise": key, "dropout": key},
                        feats[:1], mask[:1], None, zero_noise=True,
                        deterministic=True)["params"]
    params_D = disc.init({"params": key, "dropout": key}, feats[:1],
                         jnp.zeros((1, 1)), mask[:1],
                         deterministic=True)["params"]
    tx_G = create_optimizer("adam", 8e-5, weight_decay=5e-4, params=params_G)
    tx_D = optax.adam(8e-5)
    state0 = AdvTrainState(params_G=params_G, params_D=params_D,
                           opt_G=tx_G.init(params_G), opt_D=tx_D.init(params_D),
                           rng=key)
    cfg = {"loss_recon_alpha": 0.0, "loss_recon_gamma": 0.0,
           "loss_recon_norm": "l1"}
    step = make_adv_train_step(gen, disc, tx_G, tx_D, task="cont_gansurv",
                               bcb_mode="patch", loss_netD="bce",
                               coef_gan=0.004, l1_coef=1e-5, gen_updates=1,
                               nbins=4,
                               sup_loss_fn=make_supervised_loss("cont_gansurv", cfg),
                               donate=False)

    def chain(n):
        st = state0
        t0 = time.perf_counter()
        for _ in range(n):
            st, metrics, _ = step(st, batch)
        # host fetch of an updated param leaf forces full materialization
        _ = float(jnp.sum(jax.tree_util.tree_leaves(st.params_G)[0]))
        return time.perf_counter() - t0

    chain(2)  # warmup / compile
    d_short = chain(CHAIN_SHORT)
    d_long = chain(CHAIN_LONG)
    per_step = (d_long - d_short) / (CHAIN_LONG - CHAIN_SHORT)
    bags_per_sec = BATCH / per_step
    print(json.dumps({
        "metric": "gansurv_esat_train_throughput",
        "value": round(bags_per_sec, 2),
        "unit": "bags/sec/chip",
        "vs_baseline": round(bags_per_sec / REF_2XV100_BAGS_PER_SEC_ESTIMATE, 3),
    }))


if __name__ == "__main__":
    main()
