"""Hardware validation of the fused LN kernels (ops/ln_pool.py) on the real
TPU: forward and all gradients vs the jnp oracle, f32 (tight tolerance) and
bf16 (rounding tolerance), at the headline shapes. Exits nonzero on any
mismatch. Counterpart to scripts/tpu_flash_check.py.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from advmil_tpu.ops.ln_pool import (ln_relu, ln_relu_region_mean,
                                    reference_ln_relu,
                                    reference_ln_relu_region_mean)

FAILURES = []


def check(name, got, want, atol, rtol):
    got = np.asarray(got, np.float32)
    want = np.asarray(want, np.float32)
    err = np.abs(got - want)
    tol = atol + rtol * np.abs(want)
    bad = int((err > tol).sum())
    status = "ok" if bad == 0 else f"FAIL ({bad} elts)"
    print(f"  {name:28s} max|Δ|={err.max():.3e}  {status}")
    if bad:
        FAILURES.append(name)


def run(kernel, oracle, M, D, g_shape, dtype, atol, rtol, tag):
    rng = np.random.default_rng(11)
    h = jnp.asarray(rng.normal(size=(M, D)), dtype)
    sc = jnp.asarray(1.0 + 0.1 * rng.normal(size=D), jnp.float32)
    bi = jnp.asarray(0.1 * rng.normal(size=D), jnp.float32)
    g = jnp.asarray(rng.normal(size=g_shape), jnp.float32)
    print(f"[{tag}] [{M} x {D}] {jnp.dtype(dtype).name}")
    check("forward", jax.jit(kernel)(h, sc, bi),
          jax.jit(oracle)(h, sc, bi), atol, rtol)

    def loss(f):
        return lambda h, sc, bi: jnp.sum(
            f(h, sc, bi).astype(jnp.float32) * g)

    got = jax.jit(jax.grad(loss(kernel), argnums=(0, 1, 2)))(h, sc, bi)
    want = jax.jit(jax.grad(loss(oracle), argnums=(0, 1, 2)))(h, sc, bi)
    for n, a, e in zip(("dh", "dscale", "dbias"), got, want):
        check(n, a, e, atol if n == "dh" else atol * 100, rtol)


def main():
    M = 32 * 3392
    for D in (384, 128):
        run(ln_relu_region_mean, reference_ln_relu_region_mean,
            M, D, (M // 16, D), jnp.float32, 2e-5, 1e-4, "ln+relu+pool")
        run(ln_relu_region_mean, reference_ln_relu_region_mean,
            M, D, (M // 16, D), jnp.bfloat16, 2e-2, 2e-2, "ln+relu+pool")
        run(ln_relu, reference_ln_relu,
            M, D, (M, D), jnp.float32, 2e-5, 1e-4, "ln+relu")
        run(ln_relu, reference_ln_relu,
            M, D, (M, D), jnp.bfloat16, 2e-2, 2e-2, "ln+relu")
    if FAILURES:
        print("FAILURES:", FAILURES)
        sys.exit(1)
    print("all ln_pool hardware checks passed")


if __name__ == "__main__":
    main()
