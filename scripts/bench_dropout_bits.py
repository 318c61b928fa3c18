"""A/B the dropout-mask bit width (u8 vs u32) on whole train steps.

Under the shipped `rng_impl: rbg` regime the HLO rng-bit-generator op is
not fusible, so every dropout mask materializes its raw bits to HBM.
jax.random.bernoulli draws uint32 per element; models/layers.mask_dropout
draws uint8 instead (4x less mask-bit traffic) with the drop probability
quantized to 1/256ths. This script measures the whole-step effect on the
ESAT headline and graph modes, one arm per subprocess (the switch is a
trace-time module global):

    python scripts/bench_dropout_bits.py                 # both arms, both modes
    python scripts/bench_dropout_bits.py --arm u8 --mode patch --b 32
"""
import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_arm(arm: str, mode: str, b: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-u", __file__, "--arm", arm,
         "--mode", mode, "--b", str(b)],
        capture_output=True, text=True, timeout=1200)
    line = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not line:
        print(out.stdout[-2000:], out.stderr[-2000:], file=sys.stderr)
        raise RuntimeError(f"arm {arm} produced no result line")
    return json.loads(line[-1])


def measure(arm: str, mode: str, b: int) -> dict:
    import bench
    from advmil_tpu.config import apply_rng_impl, enable_compilation_cache
    from advmil_tpu.models.layers import set_compute_dtype, set_dropout_u8

    enable_compilation_cache({"xla_cache_dir": "~/.cache/advmil-tpu/xla"})
    apply_rng_impl({})  # shipped default: rbg
    set_compute_dtype("bf16")
    set_dropout_u8(arm == "u8")
    B, N = b, bench.BAG_N
    step, state, batch, _, _ = bench.build_step(mode, N, B)
    compiled, csecs, flops = bench.compile_and_flops(step, state, batch)

    def chain(n):
        return bench.chain_time(compiled, state, [batch], n)

    chain(3)
    per = bench.marginal_per_step(chain, 4, 16)
    return {"ms_per_step": round(per * 1e3, 3),
            "bags_per_sec": round(B / per, 1),
            "mfu": round(flops / per / bench.PEAK_FLOPS, 4),
            "compile_s": round(csecs, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arm", choices=["u8", "u32"])
    ap.add_argument("--mode", default="patch", choices=["patch", "graph",
                                                        "abmil", "cluster"])
    ap.add_argument("--b", type=int, default=32)
    args = ap.parse_args()
    if args.arm:
        print(json.dumps(measure(args.arm, args.mode, args.b)), flush=True)
        return
    for mode, b in [("patch", 32), ("graph", 8)]:
        rows = {arm: run_arm(arm, mode, b) for arm in ("u32", "u8")}
        speed = rows["u8"]["bags_per_sec"] / rows["u32"]["bags_per_sec"]
        print(f"\nmode={mode} B={b}")
        print("| arm | ms/step | bags/s | MFU |")
        print("|---|---|---|---|")
        for arm in ("u32", "u8"):
            r = rows[arm]
            print(f"| {arm} | {r['ms_per_step']} | {r['bags_per_sec']} "
                  f"| {r['mfu']} |")
        print(f"u8 speedup vs u32: {speed:.3f}x")


if __name__ == "__main__":
    main()
