"""Graph-mode batch-size / remat ablation on the real TPU.

Measures the full adversarial PatchGCN train step (same builder as
bench.py) at several batch sizes to check whether B=8 is leaving
throughput on the table, and optionally with remat disabled.

Usage: python scripts/bench_graph_batch.py [--bs 8 16 32] [--n 3392]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("ADVMIL_FORCE_CPU"):
    os.environ.setdefault("JAX_PLATFORMS", "cpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, nargs="+", default=[8, 16, 32])
    ap.add_argument("--n", type=int, default=3392)
    args = ap.parse_args()

    import bench
    import jax
    from advmil_tpu.models.layers import set_compute_dtype

    set_compute_dtype("bf16")
    print(f"devices: {jax.devices()}")
    for b in args.bs:
        step, state, batch, _, _ = bench.build_step("graph", args.n, b)
        compiled, csecs, flops = bench.compile_and_flops(step, state, batch)

        def chain(n, compiled=compiled, state=state, batch=batch):
            return bench.chain_time(compiled, state, [batch], n)

        chain(3)  # warm
        per = bench.marginal_per_step(chain, 4, 16)
        bags = b / per
        mfu = flops / per / bench.PEAK_FLOPS
        print(f"B={b:3d}: {per*1e3:7.2f} ms/step  {bags:8.1f} bags/s  "
              f"MFU {mfu:.3f}  compile {csecs:.1f}s")


if __name__ == "__main__":
    main()
