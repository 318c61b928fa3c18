"""Time the fused LN+ReLU+region-mean Pallas kernel (ops/ln_pool.py) against
the unfused jnp chain on TPU, at the headline step's two hot LayerNorm shapes
(scripts/profile_headline.py: embed LN [32*3392, 384], D netx LN
[32*3392, 128]).

Marginal chained-scan timing (the axon tunnel under-reports
block_until_ready; same idiom as bench.py / bench_banded_kernel.py).

Usage: python scripts/bench_lnpool.py [B] [N]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from advmil_tpu.ops.ln_pool import (ln_relu_region_mean,
                                    reference_ln_relu_region_mean)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
N = int(sys.argv[2]) if len(sys.argv) > 2 else 3392
SHORT, LONG = 8, 40


def timed(fn, x0):
    def chain(n):
        @jax.jit
        def run(x):
            def body(x, _):
                return fn(x), ()
            x, _ = jax.lax.scan(body, x, None, length=n)
            return jnp.sum(x[0, 0].astype(jnp.float32))
        run(x0)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(x0))
            best = min(best, time.perf_counter() - t0)
        return best
    return (chain(LONG) - chain(SHORT)) / (LONG - SHORT)


def main():
    rng = np.random.default_rng(0)
    for D in (384, 128):
        M = B * N
        sc = jnp.asarray(1.0 + 0.1 * rng.standard_normal(D), jnp.float32)
        bi = jnp.asarray(0.1 * rng.standard_normal(D), jnp.float32)
        h0 = jnp.asarray(rng.standard_normal((M, D)), jnp.bfloat16)

        def mk_fwd(f):
            def step(h):
                out = f(h, sc, bi)
                return h + (jnp.sum(out.astype(jnp.float32))
                            * 1e-12).astype(h.dtype)
            return step

        def mk_train(f):
            def step(h):
                def loss(hh):
                    return jnp.sum(f(hh, sc, bi).astype(jnp.float32) ** 2) * 1e-6
                return h - 0.001 * jax.grad(loss)(h).astype(h.dtype)
            return step

        gb = M * D * 2 / 1e9  # one bf16 pass of h
        print(f"-- [{M} x {D}] (one h pass = {gb:.3f} GB)")
        for name, fn in [("jnp fwd", mk_fwd(reference_ln_relu_region_mean)),
                         ("pallas fwd", mk_fwd(ln_relu_region_mean)),
                         ("jnp train", mk_train(reference_ln_relu_region_mean)),
                         ("pallas train", mk_train(ln_relu_region_mean))]:
            dt = timed(fn, h0)
            print(f"{name:14s} {dt * 1e3:7.3f} ms "
                  f"({gb / dt:6.0f} GB/s per h-pass)")

        if "--sweep" in sys.argv:
            from advmil_tpu.ops.ln_pool import set_lnpool_block_rows
            for rows in (256, 512, 1024, 2048, 4096):
                set_lnpool_block_rows(rows)
                dt = timed(mk_train(ln_relu_region_mean), h0)
                print(f"pallas train blk={rows:5d} {dt * 1e3:7.3f} ms "
                      f"({gb / dt:6.0f} GB/s per h-pass)")
            set_lnpool_block_rows(None)


if __name__ == "__main__":
    main()
