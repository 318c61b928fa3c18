"""Capture a profiler trace of one bench step and print the XLA op breakdown.

Usage:
    python scripts/profile_headline.py [--mode patch] [--b 32] [--steps 6]

Writes the trace under /tmp/advmil_profile and, when
tensorboard_plugin_profile can parse it, prints the top self-time ops.
"""
import argparse
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="patch")
    ap.add_argument("--b", type=int, default=32)
    ap.add_argument("--n", type=int, default=None)
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--out", default="/tmp/advmil_profile")
    args = ap.parse_args()

    import jax
    import bench
    from advmil_tpu.config import enable_compilation_cache
    from advmil_tpu.models.layers import set_compute_dtype

    enable_compilation_cache({"xla_cache_dir": "~/.cache/advmil-tpu/xla"})
    set_compute_dtype("bf16")
    n = args.n or bench.BAG_N
    step, state, batch, _, _ = bench.build_step(args.mode, n, args.b)
    compiled, _, _ = bench.compile_and_flops(step, state, batch)
    # warm
    st = state
    for _ in range(3):
        st, m, _ = compiled(st, batch)
    jax.block_until_ready(m)

    with jax.profiler.trace(args.out):
        for _ in range(args.steps):
            st, m, _ = compiled(st, batch)
        jax.block_until_ready(m)
    print(f"trace written to {args.out}")

    xplanes = glob.glob(os.path.join(args.out, "**", "*.xplane.pb"),
                        recursive=True)
    if not xplanes:
        print("no xplane found")
        return
    xplane = max(xplanes, key=os.path.getmtime)
    try:
        from tensorboard_plugin_profile.convert import raw_to_tool_data
        data, _ = raw_to_tool_data.xspace_to_tool_data(
            [xplane], "framework_op_stats^", {})
    except Exception as e:
        print(f"could not parse xplane ({e}); open with tensorboard instead")
        return
    if isinstance(data, bytes):
        data = data.decode()
    rows = json.loads(data)
    # framework_op_stats: list of dicts with occurrences/total/avg self time
    print(json.dumps(rows[:2], indent=2)[:2000])


if __name__ == "__main__":
    main()
