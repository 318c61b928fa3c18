"""Model statistics: parameter counts and compiled FLOPs via XLA cost
analysis — the TPU-native analogue of the reference's thop/ptflops profiling
(reference model_stats.py:142-180).

Usage:
  python -m advmil_tpu.stats --mode patch --n 3360 [--dims 1024-384-384]
"""
from __future__ import annotations

import argparse

import numpy as np


def count_params(params) -> int:
    import jax
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


def flops_of(fn, *args) -> float:
    """FLOPs of the jitted computation, from the compiled XLA cost analysis."""
    import jax
    compiled = jax.jit(fn).lower(*args).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # older jax returns a list per computation
        cost = cost[0]
    return float(cost.get("flops", float("nan")))


def backbone_stats(mode: str, dims, n_patches: int, batch: int = 1,
                   edges_per_node: int = 9) -> dict:
    import jax
    import jax.numpy as jnp
    from .models.backbones import load_backbone
    from .models.gan import Generator

    backbone = load_backbone(mode, dims, use_pallas=False)
    gen = Generator(backbone=backbone, dim_in=dims[1], dim_out=1, noise=(0, 1),
                    hops=1, out_scale="sigmoid")
    n = ((n_patches + 15) // 16) * 16
    feats = jnp.zeros((batch, n, dims[0]), jnp.float32)
    mask = jnp.ones((batch, n), jnp.float32)
    if mode == "cluster":
        extra = jnp.zeros((batch, n), jnp.int32)
    elif mode == "graph":
        # default matches config graph_edges_per_node
        epn = edges_per_node
        extra = {"edge_src": jnp.zeros((batch, n, epn), jnp.int32),
                 "edge_mask": jnp.ones((batch, n, epn), jnp.float32)}
    else:
        extra = None
    key = jax.random.PRNGKey(0)
    params = gen.init({"params": key, "noise": key, "dropout": key},
                      feats, mask, extra, zero_noise=True,
                      deterministic=True)["params"]

    def fwd(params, feats, mask):
        return gen.apply({"params": params}, feats, mask, extra,
                         zero_noise=True, deterministic=True)

    return {"mode": mode, "n_patches": n, "params": count_params(params),
            "flops_forward": flops_of(fwd, params, feats, mask)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="patch",
                    choices=["patch", "abmil", "cluster", "graph"])
    ap.add_argument("--dims", default="1024-384-384")
    ap.add_argument("--n", type=int, default=3360,
                    help="patches per bag (reference patient 128599 @20x)")
    ap.add_argument("--batch", type=int, default=1)
    args = ap.parse_args()
    dims = [int(x) for x in args.dims.split("-")]
    s = backbone_stats(args.mode, dims, args.n, args.batch)
    print(f"mode={s['mode']} n_patches={s['n_patches']} "
          f"params={s['params'] / 1e6:.3f}M "
          f"fwd_flops={s['flops_forward'] / 1e9:.3f}G")


if __name__ == "__main__":
    main()
