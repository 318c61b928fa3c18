"""Hardware validation for the Pallas flash-attention kernels (fwd + custom
VJP + in-kernel dropout). Run on a real TPU; the dropout paths use the TPU
core PRNG which has no interpret-mode lowering, so these checks cannot run
under the CPU test suite (tests/test_attention.py covers the dropout_p == 0
paths in interpret mode instead).

Checks:
  1. forward parity vs the materializing einsum (f32, highest matmul precision)
  2. gradient parity (dq/dk/dv) vs jax.grad through the einsum path
  3. dropout determinism (same seed -> identical), variation (new seed ->
     different), keep-rate, and zero-effect at dropout_p=0
  4. directional finite-difference check of the custom VJP *with* dropout
     (the dropout mask is a deterministic function of the seed, so the
     dropped objective is smooth in q/k/v and FD applies)

Usage: python scripts/tpu_flash_check.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from advmil_tpu.ops.attention import (masked_flash_attention,
                                      masked_attention_reference,
                                      pallas_available)

FAILED = []


def report(name, ok, detail=""):
    print(f"[{'ok' if ok else 'FAIL'}] {name} {detail}")
    if not ok:
        FAILED.append(name)


def main():
    if not pallas_available():
        print("No TPU backend — nothing to check.")
        return 1
    rng = np.random.default_rng(7)
    B, L, H, Dh = 2, 520, 8, 48
    q = jnp.asarray(rng.normal(size=(B, L, H, Dh)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, L, H, Dh)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, L, H, Dh)), jnp.float32)
    mask = np.ones((B, L), np.float32)
    mask[0, 400:] = 0
    mask = jnp.asarray(mask)
    mexp = mask[:, :, None, None]

    with jax.default_matmul_precision("highest"):
        # ---- 1. forward parity ----
        out = masked_flash_attention(q, k, v, mask) * mexp
        ref = masked_attention_reference(q, k, v, mask) * mexp
        err = float(jnp.abs(out - ref).max())
        report("fwd parity", err < 5e-5, f"max|Δ|={err:.2e}")

        # ---- 2. grad parity ----
        def loss_flash(q, k, v):
            o = masked_flash_attention(q, k, v, mask) * mexp
            return jnp.sum(jnp.sin(o))

        def loss_ref(q, k, v):
            o = masked_attention_reference(q, k, v, mask) * mexp
            return jnp.sum(jnp.sin(o))

        gf = jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2)))(q, k, v)
        gr = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(q, k, v)
        for name, a, b in zip("qkv", gf, gr):
            scale = float(jnp.abs(b).max())
            err = float(jnp.abs(a - b).max())
            report(f"grad parity d{name}", err < 5e-4 * max(scale, 1.0),
                   f"max|Δ|={err:.2e} (scale {scale:.2f})")

        # ---- 3. dropout behavior ----
        p_drop = 0.25
        s1 = jnp.array([1234], jnp.int32)
        s2 = jnp.array([987654], jnp.int32)
        f = jax.jit(lambda q, s: masked_flash_attention(
            q, k, v, mask, dropout_p=p_drop, seed=s) * mexp)
        o1a, o1b, o2 = f(q, s1), f(q, s1), f(q, s2)
        report("dropout same-seed deterministic",
               bool(jnp.array_equal(o1a, o1b)))
        report("dropout seed-sensitive", not bool(jnp.array_equal(o1a, o2)))
        o0 = jax.jit(lambda s: masked_flash_attention(
            q, k, v, mask, dropout_p=0.0, seed=s) * mexp)
        report("dropout_p=0 ignores seed",
               bool(jnp.array_equal(o0(s1), o0(s2))))
        # E[dropout(out)] over seeds ~= undropped out
        outs = jnp.stack([f(q, jnp.array([i], jnp.int32)) for i in range(64)])
        mean_err = float(jnp.abs(outs.mean(0) - out).max())
        report("dropout mean ~= undropped", mean_err < 0.4,
               f"max|Δmean64|={mean_err:.2e}")

        # ---- 4. exact-oracle check of the custom VJP with dropout ----
        # materialize the kernel's own keep mask and push it through a
        # materializing einsum: fwd and all three grads must match exactly
        # (up to f32), no finite-difference noise involved
        from advmil_tpu.ops.attention import (dropout_keep_mask_oracle,
                                              _round_up, _auto_block)
        blk = _auto_block(L)
        Lp = _round_up(L, blk)
        keep = dropout_keep_mask_oracle(s1, B * H, Lp, p_drop,
                                        blk_q=blk, blk_k=blk)
        keep = keep.reshape(B, H, Lp, Lp)[:, :, :L, :L]

        def loss_drop(q, k, v):
            o = masked_flash_attention(q, k, v, mask, dropout_p=p_drop,
                                       seed=s1) * mexp
            return jnp.sum(jnp.sin(o))

        def loss_oracle(q, k, v):
            scale = 1.0 / jnp.sqrt(jnp.asarray(Dh, jnp.float32))
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
            neg = jnp.asarray(jnp.finfo(jnp.float32).min, jnp.float32)
            logits = jnp.where(mask[:, None, None, :].astype(bool), logits, neg)
            probs = jax.nn.softmax(logits, axis=-1)
            probs = probs * mask[:, None, None, :]
            probs = probs * keep / (1.0 - p_drop)
            o = jnp.einsum("bhqk,bkhd->bqhd", probs, v) * mexp
            return jnp.sum(jnp.sin(o))

        lf, gf = jax.jit(jax.value_and_grad(loss_drop, argnums=(0, 1, 2)))(q, k, v)
        lo, go = jax.jit(jax.value_and_grad(loss_oracle, argnums=(0, 1, 2)))(q, k, v)
        report("dropout fwd vs materialized oracle",
               abs(float(lf - lo)) < 1e-2 * max(abs(float(lo)), 1.0),
               f"flash={float(lf):.4f} oracle={float(lo):.4f}")
        for name, a, b in zip("qkv", gf, go):
            scale_g = float(jnp.abs(b).max())
            err = float(jnp.abs(a - b).max())
            report(f"dropout grad vs oracle d{name}",
                   err < 5e-4 * max(scale_g, 1.0),
                   f"max|Δ|={err:.2e} (scale {scale_g:.2f})")

    print()
    if FAILED:
        print("FAILED:", FAILED)
        return 1
    print("all checks passed")
    return 0


if __name__ == "__main__":
    sys.exit(main())
