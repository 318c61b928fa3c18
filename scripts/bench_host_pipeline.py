"""Host input-pipeline throughput at real-dataset (NLST) scale (VERDICT r4 #4).

All published bench/e2e numbers run cached synthetic bags (cache_bags: True);
this measures whether the HOST can feed the device at scale: ~1,222 slides,
reference bag scale 210-3,360 patches (13-210 regions x16), dim-1024
reference-format `.pt` feature files (~9 GB on disk).

Reported per mode (patch / graph):
  - batcher construction seconds (graph: includes the edge-table pre-scan,
    which reads every graph file once — never the features);
  - epoch-1 COLD bags/s with cache_bags=False (page cache dropped first when
    run as root) for each --workers value: the serial loader vs the
    thread-pool loader (data/bags.py prefetch workers);
  - epoch-2 WARM bags/s with cache_bags=True (the shipped default: steady
    state after the first epoch).

Device context: the ESAT headline consumes ~7.2k bags/s/chip at N=3392
(BENCH_r04) — but at NLST scale the mean bag is ~1,780 patches and one
epoch is only ~1.2k bags, so what matters is epoch wall-clock, not matching
the synthetic peak. Numbers land in BENCHNOTES.md (host pipeline section).

Usage:
  python scripts/bench_host_pipeline.py [--root /tmp/nlst_scale]
      [--modes patch graph] [--workers 1 4 8] [--budget 65536] [--no-cold]

Generate the dataset first (once):
  python -c "from advmil_tpu.data.synthetic import make_synthetic_dataset as m;
             m('/tmp/nlst_scale', n_patients=1222, dim=1024, min_regions=13,
               max_regions=210, seed=11, feat_format='pt')"
"""
import argparse
import json
import os
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def drop_page_cache() -> bool:
    try:
        with open("/proc/sys/vm/drop_caches", "w") as f:
            f.write("3\n")
        return True
    except (PermissionError, FileNotFoundError):
        return False


def iterate(batcher, workers: int) -> tuple[float, int, int]:
    t0 = time.perf_counter()
    bags = batches = 0
    for batch in batcher.prefetch(shuffle=False, workers=workers):
        bags += int(batch.sample_mask.sum())
        batches += 1
    return time.perf_counter() - t0, bags, batches


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/nlst_scale")
    ap.add_argument("--modes", nargs="+", default=["patch", "graph"])
    ap.add_argument("--workers", type=int, nargs="+", default=[1, 4, 8])
    ap.add_argument("--budget", type=int, default=65536)
    ap.add_argument("--bucket-min", type=int, default=256)
    ap.add_argument("--no-cold", action="store_true",
                    help="skip the drop-caches cold passes")
    ap.add_argument("--limit", type=int, default=0,
                    help="use only the first N patients (smoke runs)")
    args = ap.parse_args()

    from advmil_tpu.data.bags import BagDataset, BucketBatcher

    import pandas as pd
    root = args.root
    label_path = osp.join(root, "labels.csv")
    pids = sorted(pd.read_csv(label_path)["patient_id"].unique().tolist())
    if args.limit:
        pids = pids[:args.limit]
    kws = dict(read_format="pt", time_format="ratio",
               graph_path=osp.join(root, "graphs"))
    n_bytes = sum(os.stat(osp.join(root, "feats", f)).st_size
                  for f in os.listdir(osp.join(root, "feats")))
    print(f"dataset: {len(pids)} patients used, {n_bytes / 1e9:.2f} GB "
          f"features on disk (all slides; gb_per_s is meaningless "
          f"under --limit)")

    for mode in args.modes:
        # --- cold passes: cache off, page cache dropped per pass ---
        if not args.no_cold:
            for w in args.workers:
                ds = BagDataset(pids, osp.join(root, "feats"), label_path,
                                mode, cache=False, **kws)
                t0 = time.perf_counter()
                batcher = BucketBatcher(ds, token_budget=args.budget,
                                        min_bucket=args.bucket_min)
                scan_s = time.perf_counter() - t0
                dropped = drop_page_cache()
                dt, bags, batches = iterate(batcher, w)
                print(json.dumps({
                    "mode": mode, "pass": "cold", "workers": w,
                    "page_cache_dropped": dropped,
                    "prescan_s": round(scan_s, 1),
                    "bags_per_s": round(bags / dt, 1),
                    "gb_per_s": round(n_bytes / 1e9 / dt, 2),
                    "epoch_s": round(dt, 1), "bags": bags,
                    "batches": batches}), flush=True)
        # --- warm pass: shipped default (cache_bags=True), epoch 2 ---
        ds = BagDataset(pids, osp.join(root, "feats"), label_path,
                        mode, cache=True, **kws)
        batcher = BucketBatcher(ds, token_budget=args.budget,
                                min_bucket=args.bucket_min)
        warm_fill_s, _, _ = iterate(batcher, max(args.workers))  # epoch 1
        for w in args.workers:
            dt, bags, batches = iterate(batcher, w)
            print(json.dumps({
                "mode": mode, "pass": "warm-cached", "workers": w,
                "cache_fill_epoch_s": round(warm_fill_s, 1),
                "bags_per_s": round(bags / dt, 1),
                "epoch_s": round(dt, 1), "bags": bags,
                "batches": batches}), flush=True)


if __name__ == "__main__":
    main()
