"""Time the Pallas banded aggregation kernel vs the jnp rolls path on TPU.

Shapes mirror the BENCHNOTES round-3 ablation table (B=8 bags, N=3392
nodes, epn=9, C=384, bf16) with a synthetic raster kNN graph (the same
near-banded structure tools/build_graphs.py emits). Times fwd and fwd+bwd
with the marginal chained-scan idiom from bench.py (the axon tunnel
under-reports block_until_ready).

Usage: python scripts/bench_banded_kernel.py [N] [C] [B]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from advmil_tpu.ops.segment import (banded_knn_softmax_aggregate,
                                    build_band_tables)
from advmil_tpu.ops.banded_pallas import (build_u_inv, build_u_tables,
                                          pallas_banded_aggregate)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 3392
C = int(sys.argv[2]) if len(sys.argv) > 2 else 384
B = int(sys.argv[3]) if len(sys.argv) > 3 else 8
W = 58  # raster width ~ sqrt(N)
SHORT, LONG = 8, 40


def timed(fn, x0):
    def chain(n):
        @jax.jit
        def run(x):
            def body(x, _):
                return fn(x), ()
            x, _ = jax.lax.scan(body, x, None, length=n)
            return jnp.sum(x[0, 0, 0].astype(jnp.float32))
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
    epn = 9
    offs_true = [-W - 1, -W, -W + 1, -1, 1, W - 1, W, W + 1, 2]
    esrc = np.zeros((N, epn), np.int32)
    em = np.zeros((N, epn), np.float32)
    for s, o in enumerate(offs_true):
        tgt = np.arange(N) + o
        ok = (tgt >= 0) & (tgt < N) & (rng.random(N) >= 0.02)
        esrc[ok, s] = tgt[ok]
        em[ok, s] = 1.0
    offs, bmask, rn_, rs_, rm_ = build_band_tables(esrc, em)
    u_rows, u_src, u_emask = build_u_tables(esrc, em, bmask)
    print(f"N={N} C={C} B={B} residual rows={int((u_rows < N).sum())} "
          f"edges={int(em.sum())}")

    jb = lambda a: jnp.asarray(np.broadcast_to(a, (B,) + a.shape).copy())
    a_offs, a_bm = jb(offs), jb(bmask)
    a_rn, a_rs, a_rm = jb(rn_), jb(rs_), jb(rm_)
    a_ur, a_us, a_ue = jb(u_rows), jb(u_src), jb(u_emask)
    t = jnp.float32(1.0)
    y0 = jnp.asarray(rng.standard_normal((B, N, C)), jnp.bfloat16)

    def rolls_fwd(y):
        out = jax.vmap(lambda yy, o, bm, n_, s_, m_:
                       banded_knn_softmax_aggregate(yy, o, bm, n_, s_, m_, t)
                       )(y, a_offs, a_bm, a_rn, a_rs, a_rm)
        return out + y  # keep chain alive

    a_ui = jb(build_u_inv(u_rows, N))

    def pallas_fwd(y):
        out = jax.vmap(lambda yy, o, bm, ur, us, ue, ui:
                       pallas_banded_aggregate(yy, o, bm, ur, us, ue, t, ui)
                       )(y, a_offs, a_bm, a_ur, a_us, a_ue, a_ui)
        return out + y

    def mk_train(fwd):
        def step(y):
            def loss(yy):
                return jnp.sum(fwd(yy).astype(jnp.float32) ** 2) * 1e-6
            g = jax.grad(loss)(y)
            return y - 0.001 * g.astype(y.dtype)
        return step

    for name, fn in [("rolls fwd", rolls_fwd), ("pallas fwd", pallas_fwd),
                     ("rolls train", mk_train(rolls_fwd)),
                     ("pallas train", mk_train(pallas_fwd))]:
        dt = timed(fn, y0)
        print(f"{name:14s} {dt * 1e3:7.2f} ms")


if __name__ == "__main__":
    main()
