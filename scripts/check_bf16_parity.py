"""bf16-vs-f32 validation-accuracy spot check (VERDICT r2 #9, r3 #7).

The shipped adversarial configs default to `precision: bf16` (matching every
published bench number) while the end-to-end accuracy-parity runs
(PARITY.md) are CPU/f32. This script closes the loop: train the adversarial
handler twice on the same synthetic dataset + seed — once bf16, once f32 —
on the real TPU, and report the best-val/test C-indices side by side.

Round 4 broadened the sweep beyond ESAT/cont (VERDICT r3 #7): --bcb selects
the backbone (patch/cluster/graph/abmil), --task selects cont_gansurv or
disc_gansurv (quantile labels + event-as-censorship mask), and --seeds takes
a list; the summary reports per-seed deltas and the across-seed median.

Usage: python scripts/check_bf16_parity.py [--epochs 10] [--seeds 42 43 ...]
                                           [--bcb patch] [--task cont]
Writes a small markdown table to stdout; run serially (one TPU proc).
"""
import argparse
import os
import sys

sys.path.insert(0, ".")

if os.environ.get("ADVMIL_FORCE_CPU") == "1":  # same escape hatch as main.py
    import jax
    jax.config.update("jax_platforms", "cpu")


def run(precision: str, paths, seed: int, epochs: int, outdir: str,
        bcb: str = "patch", task: str = "cont"):
    from advmil_tpu.config import with_defaults
    from advmil_tpu.train.handler import AdvHandler

    cfg = with_defaults({
        "task": "cont_gansurv", "seed": seed,
        "save_path": os.path.join(outdir, f"{bcb}-{task}-{seed}-{precision}"),
        "dataset": "synthetic",
        "path_patch": paths["path_patch"], "path_graph": paths["path_graph"],
        "path_cluster": paths["path_cluster"], "path_coordx5": None,
        "path_label": paths["path_label"], "feat_format": "npy",
        "time_format": "ratio", "time_bins": 4,
        "data_split_path": paths["data_split_path"], "data_split_seed": 0,
        "bcb_mode": "patch", "bcb_dims": "1024-384-384",
        "gen_dims": "384-1", "gen_noi_noise": "0-1",
        "gen_noi_noise_dist": "uniform", "gen_noi_hops": 1,
        "gen_norm": False, "gen_dropout": 0.6, "gen_out_scale": "sigmoid",
        "disc_type": "prj", "disc_netx_in_dim": 1024,
        "disc_netx_out_dim": 128, "disc_netx_ksize": 1,
        "disc_netx_backbone": "avgpool", "disc_netx_dropout": 0.25,
        "disc_nety_in_dim": 1, "disc_nety_hid_dims": "64-128",
        "disc_nety_norm": False, "disc_nety_dropout": 0.0,
        "disc_prj_path": "x", "disc_prj_iprd": "instance",
        "loss_gan_coef": 0.004, "loss_netD": "bce",
        "loss_regl1_coef": 0.00001, "loss_mle_alpha": 0.0,
        "loss_recon_norm": "l1", "loss_recon_alpha": 0.0,
        "loss_recon_gamma": 0.0,
        "opt_netG": "adam", "opt_netG_lr": 0.0008,
        "opt_netG_weight_decay": 0.0005, "opt_netD_lr": 0.0008,
        "epochs": epochs, "batch_size": 1, "bp_every_batch": 16,
        "es_patience": 100, "es_warmup": 1, "es_verbose": False,
        "es_start_epoch": 0, "gen_updates": 1, "monitor_metrics": "loss",
        "times_test_sample": 30, "semi_training": False,
        "semi_training_mode": "none",
        "precision": precision,
        "bcb_mode": bcb,
    })
    if task == "disc":
        cfg.update({"task": "disc_gansurv", "time_format": "quantile",
                    "gen_dims": "384-4", "disc_nety_in_dim": 4})
    metrics = AdvHandler(cfg).exec()
    out = {split: dict(kv) for split, kv in metrics.items()}
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--seeds", type=int, nargs="+", default=[42])
    ap.add_argument("--bcb", default="patch",
                    choices=["patch", "cluster", "graph", "abmil"])
    ap.add_argument("--task", default="cont", choices=["cont", "disc"])
    ap.add_argument("--workdir", default="/tmp/bf16check")
    args = ap.parse_args()

    from advmil_tpu.data.synthetic import make_synthetic_dataset
    root = os.path.join(args.workdir, "data")
    if os.path.exists(os.path.join(root, "labels.csv")):
        # Reuse a dataset already generated with THESE exact args (every arm
        # builds the identical seed-7 dataset; generation is minutes of
        # host-side kNN-graph building). Delete the workdir to force a rebuild.
        print(f"[bf16check] reusing existing dataset under {root}")
        paths = {
            "path_patch": os.path.join(root, "feats"),
            "path_label": os.path.join(root, "labels.csv"),
            "path_cluster": os.path.join(root, "clusters"),
            "path_graph": os.path.join(root, "graphs"),
            "path_coordx5": os.path.join(root, "coords"),
            "feat_format": "npy",
            "data_split_path": os.path.join(root, "split-fold{}.npz"),
        }
    else:
        paths = make_synthetic_dataset(
            root, n_patients=120, dim=1024,
            min_regions=4, max_regions=64, seed=7)

    deltas = []
    print(f"\narm: bcb={args.bcb} task={args.task} epochs={args.epochs}")
    print("\n| seed | bf16 val | f32 val | Δval | bf16 test | f32 test |")
    print("|---|---|---|---|---|---|")
    for seed in args.seeds:
        rows = {}
        for precision in ("bf16", "f32"):
            rows[precision] = run(precision, paths, seed, args.epochs,
                                  args.workdir, args.bcb, args.task)
        dv = (rows["bf16"]["validation"]["cindex"]
              - rows["f32"]["validation"]["cindex"])
        deltas.append(dv)
        print(f"| {seed} | {rows['bf16']['validation']['cindex']:.4f} "
              f"| {rows['f32']['validation']['cindex']:.4f} | {dv:+.4f} "
              f"| {rows['bf16']['test']['cindex']:.4f} "
              f"| {rows['f32']['test']['cindex']:.4f} |", flush=True)
    deltas.sort()
    med = deltas[len(deltas) // 2] if len(deltas) % 2 else \
        0.5 * (deltas[len(deltas) // 2 - 1] + deltas[len(deltas) // 2])
    print(f"\nmedian Δval (bf16 − f32) over {len(deltas)} seeds = {med:+.4f}")


if __name__ == "__main__":
    main()
