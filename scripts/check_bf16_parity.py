"""Shipped-regime vs parity-regime validation-accuracy check (VERDICT r4 #1).

Every published bench number runs the SHIPPED default regime:
``precision: bf16`` + ``rng_impl: rbg`` (TPU hardware RNG + uint8-quantized
dropout bits, models/layers.py) + the pair-batched D phase. Every recorded
accuracy artifact (PARITY.md / GOLDEN.md / GRAPHPARITY.md) runs the PARITY
regime: ``f32`` + ``threefry`` (bitwise-reproducible). This script closes the
loop: train the adversarial handler twice on the same synthetic dataset +
seed — once per regime — on the real TPU, and report the best-val/test
C-indices side by side.

Arms (VERDICT r4 #1): {cont, disc} x {patch, cluster, graph}, >=5 seeds.
``--matrix`` runs the full grid serially and appends one JSON line per
completed (arm, seed) to ``<workdir>/matrix.jsonl`` so an interrupted run
resumes where it left off.

Usage:
  python scripts/check_bf16_parity.py --matrix --seeds 42 43 44 45 46
  python scripts/check_bf16_parity.py --bcb graph --task disc --seeds 42

Run serially (one TPU proc).
"""
import argparse
import json
import os
import sys

sys.path.insert(0, ".")

if os.environ.get("ADVMIL_FORCE_CPU") == "1":  # same escape hatch as main.py
    import jax
    jax.config.update("jax_platforms", "cpu")

# regime -> (precision, rng_impl). "shipped" is the config users run
# (config.py DEFAULTS); "parity" is the regime of every recorded accuracy
# artifact. rng_impl: rbg also switches dropout-bit drawing to uint8
# (models/layers.py), so the pair captures the whole shipped stack.
REGIMES = {
    "shipped": ("bf16", "rbg"),
    "parity": ("f32", "threefry"),
    # decomposition arms (round 5): attribute a shipped-vs-parity shift to
    # the precision ingredient or to the RNG/dropout-bits ingredient
    "bf16_threefry": ("bf16", "threefry"),
    "f32_rbg": ("f32", "rbg"),
    # rbg with the uint8 dropout-bit path disabled (bernoulli u32 masks):
    # separates the hardware generator from the byte-mask optimization
    "shipped_u32": ("bf16", "rbg", False),
    # threefry bit generation with the u8 byte masks forced on: the
    # candidate fix when the rbg hardware stream (not u8) is the culprit
    "bf16_threefry_u8": ("bf16", "threefry", "always"),
}


def run(regime: str, paths, seed: int, epochs: int, outdir: str,
        bcb: str = "patch", task: str = "cont"):
    from advmil_tpu.config import with_defaults
    from advmil_tpu.train.handler import AdvHandler

    reg = REGIMES[regime]
    precision, rng_impl = reg[0], reg[1]
    from advmil_tpu.models.layers import set_dropout_u8
    set_dropout_u8(reg[2] if len(reg) > 2 else True)
    cfg = with_defaults({
        "task": "cont_gansurv", "seed": seed,
        "save_path": os.path.join(outdir, f"{bcb}-{task}-{seed}-{regime}"),
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
        "rng_impl": rng_impl,
        "bcb_mode": bcb,
    })
    if task == "disc":
        cfg.update({"task": "disc_gansurv", "time_format": "quantile",
                    "gen_dims": "384-4", "disc_nety_in_dim": 4})
    metrics = AdvHandler(cfg).exec()
    out = {split: dict(kv) for split, kv in metrics.items()}
    return out


def get_paths(workdir: str):
    from advmil_tpu.data.synthetic import make_synthetic_dataset
    root = os.path.join(workdir, "data")
    # Gate reuse on the LAST-written artifact (split file), not labels.csv:
    # an interrupted generation that wrote labels.csv but not the split would
    # otherwise pass the check forever and crash every later run (ADVICE r4).
    if (os.path.exists(os.path.join(root, "split-fold0.npz"))
            and os.path.exists(os.path.join(root, "labels.csv"))):
        print(f"[bf16check] reusing existing dataset under {root}")
        return {
            "path_patch": os.path.join(root, "feats"),
            "path_label": os.path.join(root, "labels.csv"),
            "path_cluster": os.path.join(root, "clusters"),
            "path_graph": os.path.join(root, "graphs"),
            "path_coordx5": os.path.join(root, "coords"),
            "feat_format": "npy",
            "data_split_path": os.path.join(root, "split-fold{}.npz"),
        }
    return make_synthetic_dataset(
        root, n_patients=120, dim=1024,
        min_regions=4, max_regions=64, seed=7)


def run_pair(paths, args, bcb, task, seed):
    rows = {}
    for regime in getattr(args, "regimes", None) or ("shipped", "parity"):
        rows[regime] = run(regime, paths, seed, args.epochs,
                           args.workdir, bcb, task)
    if set(rows) != {"shipped", "parity"}:
        return {"bcb": bcb, "task": task, "seed": seed,
                "epochs": args.epochs,
                **{f"{r}_val": rows[r]["validation"]["cindex"]
                   for r in rows},
                **{f"{r}_test": rows[r]["test"]["cindex"] for r in rows}}
    return {
        "bcb": bcb, "task": task, "seed": seed, "epochs": args.epochs,
        "shipped_val": rows["shipped"]["validation"]["cindex"],
        "parity_val": rows["parity"]["validation"]["cindex"],
        "shipped_test": rows["shipped"]["test"]["cindex"],
        "parity_test": rows["parity"]["test"]["cindex"],
        "dval": (rows["shipped"]["validation"]["cindex"]
                 - rows["parity"]["validation"]["cindex"]),
    }


def median(xs):
    xs = sorted(xs)
    n = len(xs)
    return xs[n // 2] if n % 2 else 0.5 * (xs[n // 2 - 1] + xs[n // 2])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--seeds", type=int, nargs="+", default=[42])
    ap.add_argument("--bcb", default="patch",
                    choices=["patch", "cluster", "graph", "abmil"])
    ap.add_argument("--task", default="cont", choices=["cont", "disc"])
    ap.add_argument("--regimes", nargs="+", default=None,
                    choices=sorted(REGIMES),
                    help="single-arm mode: which regimes to train "
                         "(default shipped+parity pair)")
    ap.add_argument("--matrix", action="store_true",
                    help="run the full {cont,disc}x{patch,cluster,graph} "
                         "grid; resumable via matrix.jsonl")
    ap.add_argument("--max-pairs", type=int, default=0,
                    help="exit after N (arm,seed) pairs: one long-lived "
                         "process accumulates ~5 GB of JAX/executable/bag "
                         "cache per training run (a 30-pair matrix OOMs a "
                         "125 GB host), so the matrix is driven as a shell "
                         "loop of short-lived resuming processes")
    ap.add_argument("--workdir", default="/tmp/bf16check")
    args = ap.parse_args()

    paths = get_paths(args.workdir)

    if args.matrix:
        arms = [(bcb, task) for task in ("cont", "disc")
                for bcb in ("patch", "cluster", "graph")]
        log = os.path.join(args.workdir, "matrix.jsonl")
        done = set()
        if os.path.exists(log):
            with open(log) as f:
                for line in f:
                    r = json.loads(line)
                    done.add((r["bcb"], r["task"], r["seed"]))
            print(f"[bf16check] resuming: {len(done)} (arm,seed) pairs done")
        ran = 0
        # seed-major order: an interrupted matrix then covers every arm at
        # k seeds rather than k arms at 5 seeds
        for seed in args.seeds:
            for bcb, task in arms:
                if (bcb, task, seed) in done:
                    continue
                if args.max_pairs and ran >= args.max_pairs:
                    print(f"[bf16check] --max-pairs {args.max_pairs} "
                          f"reached; exiting for a fresh process")
                    return
                rec = run_pair(paths, args, bcb, task, seed)
                ran += 1
                with open(log, "a") as f:
                    f.write(json.dumps(rec) + "\n")
                print(f"[bf16check] {bcb}/{task} seed={seed} "
                      f"shipped={rec['shipped_val']:.4f} "
                      f"parity={rec['parity_val']:.4f} "
                      f"dval={rec['dval']:+.4f}", flush=True)
        # summary table
        with open(log) as f:
            recs = [json.loads(line) for line in f]
        print("\n| arm | seeds | median Δval (shipped − parity) |")
        print("|---|---|---|")
        for bcb, task in arms:
            ds = [r["dval"] for r in recs
                  if r["bcb"] == bcb and r["task"] == task]
            if ds:
                print(f"| {bcb}/{task} | {len(ds)} | {median(ds):+.4f} |")
        all_ds = [r["dval"] for r in recs]
        print(f"\noverall median Δval over {len(all_ds)} pairs = "
              f"{median(all_ds):+.4f}")
        return

    regimes = list(args.regimes or ("shipped", "parity"))
    deltas = []
    print(f"\narm: bcb={args.bcb} task={args.task} epochs={args.epochs} "
          f"regimes={regimes}")
    print("\n| seed | " + " | ".join(f"{r} val" for r in regimes)
          + " | " + " | ".join(f"{r} test" for r in regimes) + " |")
    print("|---" * (1 + 2 * len(regimes)) + "|")
    for seed in args.seeds:
        rec = run_pair(paths, args, args.bcb, args.task, seed)
        if "dval" in rec:
            deltas.append(rec["dval"])
        cells = [f"{rec[f'{r}_val']:.4f}" for r in regimes]             + [f"{rec[f'{r}_test']:.4f}" for r in regimes]
        print(f"| {seed} | " + " | ".join(cells) + " |", flush=True)
    if deltas:
        print(f"\nmedian Δval (shipped − parity) over {len(deltas)} seeds = "
              f"{median(deltas):+.4f}")


if __name__ == "__main__":
    main()
