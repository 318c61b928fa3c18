"""A/B: elementwise-optimizer flattening (optax.flatten) on the full
adversarial train step.

`opt_flatten` (config.py) runs Adam & friends on one concatenated parameter
vector instead of per-leaf ops — mathematically exact (tests/test_optim.py
test_flatten_is_exact). This script measures whether the fused single-vector
update is actually visible at step granularity on the TPU, interleaving the
two compiled programs A/B/A/B so tunnel drift cancels.

Usage: python scripts/bench_opt_flatten.py [--mode patch] [--n 3392] [--b 32]
"""
import argparse
import functools
import os
import statistics
import sys
import time

sys.path.insert(0, ".")

if os.environ.get("ADVMIL_FORCE_CPU") == "1":  # same escape hatch as main.py
    import jax
    jax.config.update("jax_platforms", "cpu")


def measure(mode: str, batch_n: int, batch_b: int, reps: int = 5):
    import jax
    import jax.numpy as jnp

    import bench
    from advmil_tpu.models.layers import set_compute_dtype
    from advmil_tpu.train import optim as optim_mod

    set_compute_dtype("bf16")
    orig = optim_mod.create_optimizer

    steps = {}
    for tag, flat in [("flat", True), ("per-leaf", False)]:
        optim_mod.create_optimizer = functools.partial(orig, flatten=flat)
        # bench.build_step re-imports create_optimizer from the module each
        # call, so the patch takes effect for both G and D optimizers
        step, state, batch, _, _ = bench.build_step(mode, batch_n, batch_b)
        compiled, secs, _ = bench.compile_and_flops(step, state, batch)
        steps[tag] = (compiled, state, batch, secs)
        print(f"[{tag}] compile {secs:.1f}s", flush=True)
    optim_mod.create_optimizer = orig

    def one_pass(tag, n_short=bench.CHAIN_SHORT, n_long=bench.CHAIN_LONG):
        compiled, state, batch, _ = steps[tag]

        def run(st, b):
            return compiled(st, b)

        bench.chain_time(run, state, [batch], 2)
        d_s = bench.chain_time(run, state, [batch], n_short)
        d_l = bench.chain_time(run, state, [batch], n_long)
        return (d_l - d_s) / (n_long - n_short)

    per = {"flat": [], "per-leaf": []}
    for r in range(reps):
        for tag in ("flat", "per-leaf") if r % 2 == 0 else ("per-leaf", "flat"):
            per[tag].append(one_pass(tag))
    med = {t: statistics.median(v) for t, v in per.items()}
    for t in ("flat", "per-leaf"):
        print(f"{t:9s} median {med[t]*1e3:.3f} ms/step "
              f"({batch_b/med[t]:.0f} bags/s) all={[f'{x*1e3:.3f}' for x in per[t]]}")
    print(f"speedup flat vs per-leaf: {med['per-leaf']/med['flat']:.4f}x")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="patch")
    ap.add_argument("--n", type=int, default=3392)
    ap.add_argument("--b", type=int, default=32)
    ap.add_argument("--reps", type=int, default=5)
    a = ap.parse_args()
    measure(a.mode, a.n, a.b, a.reps)
