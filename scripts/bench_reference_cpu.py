"""MEASURED throughput of the reference's eager adversarial per-bag step on
CPU (VERDICT r1 #8: replace/augment the estimated 2xV100 anchor with a
measured number).

This times exactly the per-bag work of the reference hot loop at reference
scale (N=3360 patches, dims 1024-384-384, reference model_stats.py:100-103):
  D phase (reference model/model_handler.py:349-424): netG fwd (detached),
  netD fwd on the real pair, netD fwd on the fake pair; one D backward+step
  per 16 bags.
  G phase (reference model/model_handler.py:426-498): netG fwd, netD fwd;
  one G backward+step per 16 bags.
It is a CPU number — a hard LOWER bound on the reference's own 2xV100
hardware, reported alongside the documented ~100 bags/sec GPU estimate.

Usage: python scripts/bench_reference_cpu.py [--bags 8] [--n 3360]
Prints one JSON line.
"""
import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from _run_reference import install_stubs  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bags", type=int, default=8)
    ap.add_argument("--n", type=int, default=3360)
    ap.add_argument("--reference", default="/root/reference")
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

    bags = [torch.randn(1, args.n, 1024) for _ in range(min(args.bags, 4))]
    t_label = torch.rand(1, 1)

    def one_accum_window(k):
        # D phase over k bags, one step (reference model_handler.py:349-424)
        reals, fakes = [], []
        for i in range(k):
            x = bags[i % len(bags)]
            pred = netG(x, None).detach()
            reals.append(netD(x, t_label).view(-1))
            fakes.append(netD(x, pred).view(-1))
        d_loss = real_fake_loss(torch.cat(reals), torch.cat(fakes),
                                which="bce")
        optD.zero_grad(); d_loss.backward(); optD.step()
        # G phase over k bags, one step (reference model_handler.py:426-498)
        fakes, preds = [], []
        for i in range(k):
            x = bags[i % len(bags)]
            pred = netG(x, None)
            preds.append(pred)
            fakes.append(netD(x, pred).view(-1))
        g_loss = fake_generator_loss(torch.cat(fakes))
        preds = torch.cat(preds)
        tr = recon_loss(preds, t_label.expand(k, 1).reshape(-1),
                        torch.ones(k), alpha=0.0, gamma=0.0)
        total = tr + 0.004 * g_loss
        optG.zero_grad(); total.backward(); optG.step()

    one_accum_window(2)  # warmup
    t0 = time.perf_counter()
    one_accum_window(args.bags)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "reference_eager_cpu_train_throughput",
        "value": round(args.bags / dt, 3),
        "unit": "bags/sec (1 CPU core)",
        "bag_n": args.n,
        "note": "measured lower bound for the reference pipeline; its own "
                "2xV100 hardware is estimated at ~100 bags/sec",
    }))


if __name__ == "__main__":
    main()
