"""Measure the einsum-vs-flash crossover for masked MHA on the real TPU.

Times a full fwd+bwd (jax.grad through q, k, v) and an eval forward for both
attention paths at ESAT shapes (H=8, Dh=48 -> head dim padded to 128 lanes in
the kernel), bf16 compute, dropout 0.25 on the training step (bernoulli-on-
materialized-probs for the einsum path, in-kernel PRNG for flash). The
result calibrates the `flash_min_len` config default (models/layers.py
_masked_mha gate).

Timing is the marginal cost between a short and a long chained run ended by
a host fetch (the axon tunnel under-reports block_until_ready; same idiom
as bench.py).

Usage: python scripts/bench_flash_crossover.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from advmil_tpu.ops.attention import masked_flash_attention

B, H, Dh = 4, 8, 48
DROP = 0.25
SHORT, LONG = 16, 80


def einsum_attn(q, k, v, mask, key=None):
    scale = 1.0 / jnp.sqrt(jnp.asarray(Dh, q.dtype))
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    neg = jnp.asarray(jnp.finfo(logits.dtype).min, logits.dtype)
    logits = jnp.where(mask[:, None, None, :].astype(bool), logits, neg)
    probs = jax.nn.softmax(logits, axis=-1)
    probs = probs * mask[:, None, None, :].astype(probs.dtype)
    if key is not None:
        keep = jax.random.bernoulli(key, 1.0 - DROP, probs.shape)
        probs = probs * keep / (1.0 - DROP)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


def timed(step, x0):
    """Marginal per-step device seconds: a jit-ed lax.scan of SHORT vs LONG
    chained steps (one dispatch each, so tunnel RPC latency cancels)."""
    def chain(n):
        @jax.jit
        def run(x):
            def body(x, _):
                return step(x), ()
            x, _ = jax.lax.scan(body, x, None, length=n)
            return jnp.sum(x[0, 0, 0].astype(jnp.float32))
        run(x0)  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(x0))
            best = min(best, time.perf_counter() - t0)
        return best

    ds, dl = chain(SHORT), chain(LONG)
    return (dl - ds) / (LONG - SHORT)


def main():
    assert jax.default_backend() == "tpu", "needs the real chip"
    rng = np.random.default_rng(0)
    print(f"# B={B} H={H} Dh={Dh} bf16, train=grad(qkv)+dropout{DROP}, eval=fwd")
    print(f"{'L':>6} {'train ein':>10} {'train fla':>10} {'ratio':>6} "
          f"{'eval ein':>10} {'eval fla':>10} {'ratio':>6}")
    for L in (256, 512, 768, 1024, 2048):
        q, k, v = (jnp.asarray(rng.normal(size=(B, L, H, Dh)), jnp.bfloat16)
                   for _ in range(3))
        mask = np.ones((B, L), np.float32)
        mask[0, int(L * 0.8):] = 0
        mask = jnp.asarray(mask)
        key = jax.random.PRNGKey(0)
        seed = jnp.array([1234], jnp.int32)

        def loss_e(q):
            return jnp.sum(einsum_attn(q, k, v, mask, key).astype(jnp.float32))

        def loss_f(q):
            return jnp.sum(masked_flash_attention(
                q, k, v, mask, dropout_p=DROP, seed=seed).astype(jnp.float32))

        def loss_e_eval(q):
            return jnp.sum(einsum_attn(q, k, v, mask).astype(jnp.float32))

        def loss_f_eval(q):
            return jnp.sum(masked_flash_attention(
                q, k, v, mask).astype(jnp.float32))

        step_e = jax.jit(lambda q: q - 1e-6 * jax.grad(loss_e)(q))
        step_f = jax.jit(lambda q: q - 1e-6 * jax.grad(loss_f)(q))
        fwd_e = jax.jit(lambda q: q + 1e-6 * einsum_attn(q, k, v, mask))
        fwd_f = jax.jit(lambda q: q + 1e-6 * masked_flash_attention(q, k, v, mask))

        te, tf = timed(step_e, q), timed(step_f, q)
        ee, ef = timed(fwd_e, q), timed(fwd_f, q)
        print(f"{L:>6} {te*1e3:>9.2f}m {tf*1e3:>9.2f}m {te/tf:>6.2f} "
              f"{ee*1e3:>9.2f}m {ef*1e3:>9.2f}m {ee/ef:>6.2f}")


if __name__ == "__main__":
    main()
