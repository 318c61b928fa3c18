"""Derive the ~100 bags/sec reference-GPU throughput anchor (VERDICT r4 #3).

Every bench.py `vs_baseline` divides by REF_2XV100_BAGS_PER_SEC_ESTIMATE.
The reference publishes no throughput numbers, and its 2xV100 box is not
available here, so the anchor must be DERIVED, not asserted. This script
instruments the reference's own hot loop (the same per-bag op sequence as
scripts/bench_reference_cpu.py, built from unmodified /root/reference
modules) with a TorchDispatchMode and measures, per bag:

  1. K  — ATen dispatch count (each eager dispatch is one-or-more CUDA
     kernel launches on GPU; K is a LOWER bound on launches since many ATen
     ops map to several kernels, e.g. softmax fwd+bwd, layer_norm);
  2. F  — matmul-class FLOPs (mm/addmm/bmm/baddbmm/convolution, fwd+bwd).

Two independent bounds on the reference's 2xV100 eager B=1 pipeline follow:

  launch-bound:   rate <= 1 / (K x t_launch), with t_launch the eager
                  per-dispatch overhead (Python dispatch + kernel launch;
                  5-20 us is the commonly observed eager-mode range, and the
                  reference's second GPU does not help a B=1 serial loop);
  compute-bound:  rate <= F / (15.7 TFLOP/s x MFU): V100 f32 peak is
                  15.7 TFLOP/s, and eager f32 at these small per-op sizes
                  reaches ~10-30% MFU.

Cross-check: the measured 4.18 bags/s one-CPU-core run implies
F_eff ~ 4.18 x F FLOP/s sustained on the core — sanity-checks F against a
plausible single-core f32 throughput (tens of GFLOP/s).

Usage: python scripts/derive_anchor.py [--n 3360] [--accum 16]
Prints the measured K and F and the resulting anchor table; the derived
conclusion lives in BASELINE.md ("Deriving the throughput anchor").
"""
import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from _run_reference import install_stubs  # noqa: E402


class OpMeter:
    """Counts ATen dispatches and matmul-class FLOPs under eager execution."""

    def __init__(self):
        self.ops = 0
        self.flops = 0
        self.by_name = {}

    def _conv_flops(self, args):
        x, w = args[0], args[1]
        out_spatial = 1
        stride = args[3] if len(args) > 3 else [1]
        pad = args[4] if len(args) > 4 else [0]
        for i, l in enumerate(x.shape[2:]):
            s = stride[i] if i < len(stride) else 1
            p = pad[i] if i < len(pad) else 0
            out_spatial *= (l + 2 * p - w.shape[2 + i]) // s + 1
        # 2 * N * Cout * L_out * (Cin/groups) * prod(k)
        k = 1
        for kk in w.shape[2:]:
            k *= kk
        return 2 * x.shape[0] * w.shape[0] * out_spatial * w.shape[1] * k

    def mode(self):
        from torch.utils._python_dispatch import TorchDispatchMode

        meter = self

        class _M(TorchDispatchMode):
            def __torch_dispatch__(self, func, types, args=(), kwargs=None):
                meter.ops += 1
                name = func.overloadpacket.__name__
                meter.by_name[name] = meter.by_name.get(name, 0) + 1
                try:
                    if name in ("mm", "addmm"):
                        a, b = (args[0], args[1]) if name == "mm" else \
                            (args[1], args[2])
                        meter.flops += 2 * a.shape[0] * a.shape[1] * b.shape[1]
                    elif name in ("bmm", "baddbmm"):
                        a, b = (args[0], args[1]) if name == "bmm" else \
                            (args[1], args[2])
                        meter.flops += (2 * a.shape[0] * a.shape[1]
                                        * a.shape[2] * b.shape[2])
                    elif name == "convolution":
                        meter.flops += meter._conv_flops(args)
                except Exception:
                    pass
                return func(*args, **(kwargs or {}))

        return _M()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=3360)
    ap.add_argument("--accum", type=int, default=16,
                    help="bags per optimizer window (reference "
                         "bp_every_batch, config/cfg_nlst.yaml)")
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument("--top", type=int, default=12)
    args = ap.parse_args()

    install_stubs()
    sys.path.insert(0, args.reference)
    from types import SimpleNamespace

    import torch
    from model.backbone import load_backbone
    from model.GANSurv import Generator, PrjDiscriminator
    from loss.utils import real_fake_loss, fake_generator_loss, recon_loss

    torch.manual_seed(0)
    backbone = load_backbone("patch", [1024, 384, 384])
    args_noise = SimpleNamespace(noise=[0, 1], hops=1, noise_dist="uniform")
    netG = Generator(384, 1, backbone, args_noise, norm=False, dropout=0.6,
                     out_scale="sigmoid")
    args_netx = SimpleNamespace(in_dim=1024, out_dim=128, ksize=1,
                                backbone="avgpool", dropout=0.25)
    args_nety = SimpleNamespace(in_dim=1, hid_dims=[64, 128], norm=False,
                                dropout=0.0)
    netD = PrjDiscriminator(args_netx, args_nety, prj_path="x",
                            inner_product="instance")
    optG = torch.optim.Adam(netG.parameters(), lr=8e-5)
    optD = torch.optim.Adam(netD.parameters(), lr=8e-5)

    x = torch.randn(1, args.n, 1024)
    t_label = torch.rand(1, 1)
    k = args.accum

    def window():
        # exactly the per-window op sequence of the reference hot loop
        # (model/model_handler.py:349-498); see bench_reference_cpu.py
        reals, fakes = [], []
        for _ in range(k):
            pred = netG(x, None).detach()
            reals.append(netD(x, t_label).view(-1))
            fakes.append(netD(x, pred).view(-1))
        d_loss = real_fake_loss(torch.cat(reals), torch.cat(fakes),
                                which="bce")
        optD.zero_grad(); d_loss.backward(); optD.step()
        fakes, preds = [], []
        for _ in range(k):
            pred = netG(x, None)
            preds.append(pred)
            fakes.append(netD(x, pred).view(-1))
        g_loss = fake_generator_loss(torch.cat(fakes))
        preds = torch.cat(preds)
        tr = recon_loss(preds, t_label.expand(k, 1).reshape(-1),
                        torch.ones(k), alpha=0.0, gamma=0.0)
        (tr + 0.004 * g_loss).backward()
        optG.step(); optG.zero_grad()

    window()  # warmup (autograd graph metadata, allocator)
    meter = OpMeter()
    t0 = time.perf_counter()
    with meter.mode():
        window()
    dt = time.perf_counter() - t0

    K = meter.ops / k
    F = meter.flops / k
    print(f"measured on the UNMODIFIED reference hot loop, N={args.n}, "
          f"accum window {k} (wall {dt:.1f}s on CPU):")
    print(f"  K = {K:.0f} ATen dispatches / bag (lower bound on CUDA "
          f"kernel launches)")
    print(f"  F = {F / 1e9:.2f} GFLOP / bag (matmul-class, fwd+bwd)")
    top = sorted(meter.by_name.items(), key=lambda kv: -kv[1])[:args.top]
    print("  top dispatches/window:",
          ", ".join(f"{n}:{c}" for n, c in top))

    print("\nlaunch-bound rate = 1 / (K x t_launch):")
    for t_us in (5, 10, 20):
        print(f"  t_launch = {t_us:3d} us  ->  "
              f"{1.0 / (K * t_us * 1e-6):7.1f} bags/s")
    print("\ncompute-bound rate = 15.7 TFLOP/s x MFU / F  (V100 f32 peak):")
    for mfu in (0.1, 0.2, 0.3):
        print(f"  MFU = {mfu:.1f}         ->  "
              f"{15.7e12 * mfu / F:7.1f} bags/s")
    cpu_rate = 4.18  # measured: scripts/bench_reference_cpu.py (BENCHNOTES)
    print(f"\nCPU cross-check: measured {cpu_rate} bags/s x F = "
          f"{cpu_rate * F / 1e9:.1f} GFLOP/s sustained on one core "
          f"(plausible f32 single-core range: 20-100 GFLOP/s)")
    print(json.dumps({
        "metric": "reference_anchor_derivation",
        "dispatches_per_bag": round(K),
        "gflop_per_bag": round(F / 1e9, 2),
        "launch_bound_bags_per_s_at_10us": round(1.0 / (K * 1e-5), 1),
        "compute_bound_bags_per_s_at_mfu0.2": round(15.7e12 * 0.2 / F, 1),
    }))


if __name__ == "__main__":
    main()
