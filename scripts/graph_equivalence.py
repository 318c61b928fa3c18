"""Ours-vs-ours PatchGCN training equivalence: banded Pallas vs jnp oracle.

torch_geometric cannot be installed here, so the graph backbone has no
reference-side end-to-end arm (scripts/_run_reference.py stubs it with
raising classes). This script provides the substitute accuracy evidence the
kernel rewrite needs: train the SAME model config twice with the SAME seed —
identical init, shuffle stream, dropout keys, batching — differing ONLY in
the aggregation kernel path:

  * banded_pallas: `graph_banded: auto` + `use_pallas: true` — the shipped
    TPU path (VMEM-resident banded kernel + residual overwrite,
    ops/banded_pallas.py; falls back to the rolls path off-TPU);
  * oracle: `graph_banded: off` + `use_pallas: false` — the plain jnp
    gather + masked-softmax path (ops/segment.knn_edge_softmax_aggregate),
    itself golden-tested against an independent torch GENConv
    (tests/test_genconv_golden.py).

Near-identical per-epoch val C-index trajectories prove the exotic kernel
path does not alter training; the GENConv golden test anchors the semantics
to the reference's documented layer. Covers both handlers: the surv_nll
baseline (single optimizer) and the cont_gansurv adversarial loop.

Run on the TPU (f32). Writes GRAPHPARITY.md / GRAPHPARITY.json.
Usage: python scripts/graph_equivalence.py [--epochs 30] [--seeds 42 47]
"""
import argparse
import json
import os
import os.path as osp
import sys

os.environ.setdefault("ADVMIL_FORCE_COMPACT_LOG", "1")

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, osp.join(REPO, "scripts"))

import numpy as np  # noqa: E402

from run_parity import build_dataset, base_cfg, adv_cfg  # noqa: E402


class _RecLogger:
    def __init__(self):
        self.logs = []

    def log(self, d):
        self.logs.append({k: float(v) for k, v in d.items()})

    def finish(self):
        pass


def graph_cfg(arm, paths, fold, seed, run_dir, epochs):
    builder = base_cfg if arm == "base_nll_graph" else adv_cfg
    cfg = builder(paths, fold, run_dir, epochs)
    cfg.update({
        "seed": seed,
        "bcb_mode": "graph",
        "precision": "f32",
        # recorded GRAPHPARITY artifacts were produced under threefry; pin it
        # (the comparison is arm-vs-arm so any impl is self-consistent, but
        # pinning keeps the recorded numbers reproducible)
        "rng_impl": "threefry",
        # one bucket, 16 bags per device batch: bounds compile count and
        # keeps per-step bag grouping identical across variants
        "bucket_min": 256,
        "batch_token_budget": 4096,
        "batch_max_size": 16,
        "monitor_metrics": "loss",
    })
    if arm == "adv_graph":
        # graph bags enter netD through the patch-feature tower
        cfg["disc_netx_in_dim"] = 128
    return cfg


VARIANTS = {
    "banded_pallas": {"graph_banded": "auto", "use_pallas": True},
    "oracle": {"graph_banded": "off", "use_pallas": False,
               "graph_scatter_free": "off"},
}


def run_variant(arm, cfg, variant):
    cfg = dict(cfg)
    cfg.update(VARIANTS[variant])
    if arm == "base_nll_graph":
        from advmil_tpu.train.baseline import BaselineHandler as H
    else:
        from advmil_tpu.train.handler import AdvHandler as H
    handler = H(cfg)
    rec = _RecLogger()
    handler.logger = rec
    metrics = handler.exec()
    val_ci = [d["validation/c_index"] for d in rec.logs
              if "validation/c_index" in d]
    key = ("train_batch/net/loss_supervision" if arm == "base_nll_graph"
           else "train_batch/Loss_G_total")
    losses = [d[key] for d in rec.logs if key in d]
    return {
        "val_ci": val_ci,
        "train_losses": losses[:64],
        "final_val": float(dict(metrics["validation"])["cindex"]),
        "final_test": float(dict(metrics["test"])["cindex"]),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arms", nargs="+",
                    default=["base_nll_graph", "adv_graph"])
    ap.add_argument("--folds", type=int, nargs="+", default=[0])
    ap.add_argument("--seeds", type=int, nargs="+", default=[42, 47])
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--workdir", default="/tmp/graph_equiv")
    ap.add_argument("--out", default="GRAPHPARITY")
    ap.add_argument("--summarize-from", default=None,
                    help="existing results json: rewrite the report without "
                         "re-running anything")
    args = ap.parse_args()

    if args.summarize_from:
        with open(args.summarize_from) as f:
            results = json.load(f)
        with open(osp.join(REPO, f"{args.out}.json"), "w") as f:
            json.dump(results, f, indent=2)
        write_report(results, args)
        print(f"[graph-equiv] rewrote {args.out}.md / {args.out}.json")
        med = float(np.median([r["final_val_a"] - r["final_val_b"]
                               for r in results]))
        sys.exit(0 if abs(med) <= 0.005 else 1)

    os.makedirs(args.workdir, exist_ok=True)
    paths = build_dataset(args.workdir, 5)
    results = []
    for arm in args.arms:
        for fold in args.folds:
            for seed in args.seeds:
                tag = osp.join(args.workdir, arm, f"fold{fold}s{seed}")
                cfg = graph_cfg(arm, paths, fold, seed, tag, args.epochs)
                a = run_variant(arm, dict(cfg, save_path=osp.join(tag, "a")),
                                "banded_pallas")
                b = run_variant(arm, dict(cfg, save_path=osp.join(tag, "b")),
                                "oracle")
                ne = min(len(a["val_ci"]), len(b["val_ci"]))
                ci_diffs = [abs(a["val_ci"][e] - b["val_ci"][e])
                            for e in range(ne)]
                nl = min(len(a["train_losses"]), len(b["train_losses"]))
                loss_rel = [abs(a["train_losses"][i] - b["train_losses"][i])
                            / max(abs(b["train_losses"][i]), 1e-8)
                            for i in range(nl)]
                step1_rel = loss_rel[0] if loss_rel else None
                r = {
                    "arm": arm, "fold": fold, "seed": seed,
                    "epochs_a": len(a["val_ci"]), "epochs_b": len(b["val_ci"]),
                    "val_ci_a": a["val_ci"], "val_ci_b": b["val_ci"],
                    "max_val_ci_diff": max(ci_diffs) if ci_diffs else None,
                    "first_ci_diff_epoch": next(
                        (e + 1 for e, d in enumerate(ci_diffs) if d > 1e-9),
                        None),
                    "step1_trainloss_rel_diff": step1_rel,
                    "worst_trainloss_rel_diff": max(loss_rel) if loss_rel else None,
                    "final_val_a": a["final_val"], "final_val_b": b["final_val"],
                    "final_test_a": a["final_test"], "final_test_b": b["final_test"],
                    "abs_final_val_diff": abs(a["final_val"] - b["final_val"]),
                }
                results.append(r)
                print(f"[graph-equiv] {arm} fold {fold} seed {seed}: "
                      f"max epoch ci diff {r['max_val_ci_diff']}, final val "
                      f"{a['final_val']:.4f} vs {b['final_val']:.4f}",
                      flush=True)

    with open(osp.join(REPO, f"{args.out}.json"), "w") as f:
        json.dump(results, f, indent=2)
    write_report(results, args)
    print(f"[graph-equiv] wrote {args.out}.md / {args.out}.json")
    # same primary criterion as the torch parity arms: the across-run MEDIAN
    # paired final-val delta (single runs differ by checkpoint-selection
    # chaos exactly like the torch arms do)
    med = float(np.median([r["final_val_a"] - r["final_val_b"]
                           for r in results]))
    sys.exit(0 if abs(med) <= 0.005 else 1)


def write_report(results, args):
    lines = [
        "# GRAPHPARITY — PatchGCN kernel-path training equivalence",
        "",
        "torch_geometric cannot be installed in this environment, so the "
        "graph backbone's end-to-end accuracy evidence is this substitute "
        "pair (VERDICT r3):",
        "",
        "1. **Semantics anchor**: `tests/test_genconv_golden.py` — GENConv "
        "forward + gradients (inputs, MLP/LN params, learnable temperature) "
        "match an independent pure-torch implementation of the documented "
        "pyg semantics (reference model/backbone.py:139).",
        "2. **Kernel-path equivalence** (this file): same config, same seed "
        "(identical init / shuffle / dropout keys), trained twice — shipped "
        "banded-Pallas path vs the plain jnp gather+masked-softmax oracle — "
        "on the TPU in f32. Any trajectory split isolates the kernel path.",
        "",
    ]
    dv = [r["final_val_a"] - r["final_val_b"] for r in results]
    n_eq = sum(abs(d) < 1e-9 for d in dv)
    n_in = sum(abs(d) <= 0.005 for d in dv)
    med = float(np.median(dv))
    lines += [
        "## Verdict",
        "",
        f"- step-1 train loss identical (or ≤1e-6 relative) in "
        f"{sum((r['step1_trainloss_rel_diff'] or 0) <= 1e-6 for r in results)}"
        f"/{len(results)} runs — the paths compute the same function; "
        "divergence beyond that is f32 summation-order chaos amplified over "
        "~180 optimizer steps",
        f"- final best-checkpoint val C-index: exactly equal in "
        f"{n_eq}/{len(results)} runs, within the 0.005 north star in "
        f"{n_in}/{len(results)}; median paired delta = {med:+.4f} "
        f"{'✅ within 0.005' if abs(med) <= 0.005 else '❌ outside 0.005'} "
        "(same primary criterion as the torch parity arms — single runs "
        "differ by loss-monitored checkpoint-selection chaos there too, "
        "see PARITY.md)",
        "",
        "| arm | fold | seed | epochs (a/b) | max per-epoch val-ci diff | "
        "first differing epoch | step-1 / worst train-loss rel diff | "
        "final val a | final val b | final |Δ| |",
        "|---|---|---|---|---|---|---|---|---|---|",
    ]
    for r in results:
        lines.append(
            f"| {r['arm']} | {r['fold']} | {r['seed']} | "
            f"{r['epochs_a']}/{r['epochs_b']} | "
            f"{r['max_val_ci_diff']:.2e} | "
            f"{r['first_ci_diff_epoch'] or 'none'} | "
            f"{r['step1_trainloss_rel_diff']:.1e} / "
            f"{r['worst_trainloss_rel_diff']:.1e} | "
            f"{r['final_val_a']:.4f} | {r['final_val_b']:.4f} | "
            f"{r['abs_final_val_diff']:.4f} |")
    lines += [
        "",
        "Reading the table: the two paths compute the same function (unit "
        "equivalence + golden tests); in full f32 training their different "
        "summation orders inject ~1e-7-relative per-step noise that chaos "
        "amplifies over epochs, so per-epoch val C-index may differ by a few "
        "discordant-pair flips (the metric's per-fold quantum here is "
        "~0.004). The pass bar is the parity north star applied to the pair: "
        "final best-checkpoint val C-index within 0.005.",
        "",
        "Variant a = `graph_banded: auto` + `use_pallas: true` (banded "
        "Pallas aggregation, ops/banded_pallas.py). Variant b = "
        "`graph_banded: off` + `use_pallas: false` + reverse tables off "
        "(jnp oracle, ops/segment.knn_edge_softmax_aggregate).",
        "",
        f"Reproduce: `python scripts/graph_equivalence.py --arms "
        f"{' '.join(args.arms)} --folds {' '.join(map(str, args.folds))} "
        f"--seeds {' '.join(map(str, args.seeds))} --epochs {args.epochs}` "
        "(requires the TPU; off-TPU the 'banded' variant exercises the "
        "rolls fallback instead of the Pallas kernel).",
        "",
    ]
    with open(osp.join(REPO, f"{args.out}.md"), "w") as f:
        f.write("\n".join(lines))


if __name__ == "__main__":
    main()
