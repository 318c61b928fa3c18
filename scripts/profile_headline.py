"""Capture a profiler trace of one bench step and print the XLA op breakdown.

Usage:
    python scripts/profile_headline.py [--mode patch] [--b 32] [--steps 6]

Writes the trace under /tmp/advmil_profile and, when
tensorboard_plugin_profile can parse it, prints the top self-time ops.
"""
import argparse
import os
# tensorboard_plugin_profile's generated protos predate protobuf 4's C++
# fast path; the pure-python parser still reads them
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
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
    ap.add_argument("--toolbuilt", action="store_true",
                    help="graph mode: profile on REAL tool-built tissue "
                         "graphs (grid-raster banded tables) instead of the "
                         "idealized raster (VERDICT r4 #2 lever d)")
    args = ap.parse_args()

    import jax
    import bench
    from advmil_tpu.config import enable_compilation_cache
    from advmil_tpu.models.layers import set_compute_dtype

    enable_compilation_cache({"xla_cache_dir": "~/.cache/advmil-tpu/xla"})
    set_compute_dtype("bf16")
    n = args.n or bench.BAG_N
    graph_batch = None
    if args.toolbuilt:
        assert args.mode == "graph", "--toolbuilt implies --mode graph"
        graph_batch, _, stats = bench.toolbuilt_graph_batches(
            args.b, with_gather=False)
        n = stats["bucket_n"]
        print(f"tool-built tables: {stats}")
    step, state, batch, _, _ = bench.build_step(args.mode, n, args.b,
                                                graph_batch=graph_batch)
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
    # compact top-op table: one line per op, sorted by total self time
    try:
        hdr = rows[0]
        body = rows[1:] if isinstance(rows[0], list) else rows
        if isinstance(hdr, list) and "Type" in hdr:
            i_name = hdr.index("Type")
            i_self = (hdr.index("Total self-time (us)")
                      if "Total self-time (us)" in hdr else None)
            i_occ = hdr.index("#Occurrences") if "#Occurrences" in hdr else None
            if i_self is not None:
                body = sorted(body, key=lambda r: -float(r[i_self]))
                total = sum(float(r[i_self]) for r in body)
                print(f"\ntop ops by self time (total {total / 1e3:.2f} ms "
                      f"over {args.steps} steps):")
                for r in body[:30]:
                    occ = f" x{r[i_occ]}" if i_occ is not None else ""
                    print(f"  {float(r[i_self]) / 1e3:8.3f} ms "
                          f"({100 * float(r[i_self]) / total:4.1f}%) "
                          f"{r[i_name]}{occ}")
    except Exception as e:  # table layout varies across plugin versions
        print(f"(top-op table unavailable: {e})")


if __name__ == "__main__":
    main()
