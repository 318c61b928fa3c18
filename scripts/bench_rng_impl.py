"""A/B the dropout-RNG implementation on the ESAT headline step.

Threefry (JAX default) computes random bits on the VPU and is known to be
expensive on TPU for large dropout masks; `unsafe_rbg` uses the hardware
RNG path. The headline ESAT adversarial step draws dropout masks over
[B,N,384]-sized activations in both the D and G phases, so the generator
choice is measurable. Run each arm in a separate process (the PRNG impl is
a global flag):

    python scripts/bench_rng_impl.py            # both arms via subprocess
    python scripts/bench_rng_impl.py --arm threefry|rbg
"""
import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_arm(arm: str, mode: str, b: int) -> float:
    env = dict(os.environ)
    if arm == "rbg":
        env["JAX_DEFAULT_PRNG_IMPL"] = "unsafe_rbg"
    out = subprocess.run(
        [sys.executable, "-u", __file__, "--arm", arm,
         "--mode", mode, "--b", str(b)],
        env=env, capture_output=True, text=True, timeout=900)
    line = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not line:
        print(out.stdout[-2000:], out.stderr[-2000:], file=sys.stderr)
        raise RuntimeError(f"arm {arm} produced no result line")
    return json.loads(line[-1])


def measure(mode: str, b: int) -> dict:
    import bench
    from advmil_tpu.config import enable_compilation_cache
    from advmil_tpu.models.layers import set_compute_dtype

    enable_compilation_cache({"xla_cache_dir": "~/.cache/advmil-tpu/xla"})
    set_compute_dtype("bf16")
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
    ap.add_argument("--arm", choices=["threefry", "rbg"])
    ap.add_argument("--mode", default="patch")
    ap.add_argument("--b", type=int, default=32)
    args = ap.parse_args()
    if args.arm:
        import jax
        print(f"impl: {jax.config.jax_default_prng_impl}", file=sys.stderr)
        print(json.dumps(measure(args.mode, args.b)))
        return
    res = {arm: run_arm(arm, args.mode, args.b) for arm in ("threefry", "rbg")}
    speedup = res["rbg"]["bags_per_sec"] / res["threefry"]["bags_per_sec"]
    print(json.dumps({"threefry": res["threefry"], "rbg": res["rbg"],
                      "rbg_speedup": round(speedup, 3)}, indent=2))


if __name__ == "__main__":
    main()
