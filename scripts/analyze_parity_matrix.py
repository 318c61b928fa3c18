"""Summarize the shipped-vs-parity regime matrix (VERDICT r4 #1).

Reads the ``matrix.jsonl`` written by ``check_bf16_parity.py --matrix``
(one line per completed (backbone, task, seed) pair; interrupted runs may
re-append a pair — last line wins) and prints a per-arm table of paired
val/test C-index deltas (shipped bf16+rbg+u8 MINUS parity f32+threefry),
plus the cross-arm pooled summary, as the markdown recorded in BENCHNOTES.

Usage: python scripts/analyze_parity_matrix.py /tmp/bf16check/matrix.jsonl
"""
import json
import sys

import numpy as np


def main(path: str) -> None:
    rows = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            r = json.loads(line)
            rows[(r["bcb"], r["task"], r["seed"])] = r  # last write wins
    arms = {}
    for (bcb, task, _seed), r in sorted(rows.items()):
        arms.setdefault((bcb, task), []).append(r)
    print("| arm | seeds | median dval | dval range | median dtest | "
          "median shipped val | median parity val |")
    print("|---|---|---|---|---|---|---|")
    all_dval, all_dtest = [], []
    for (bcb, task), rs in sorted(arms.items()):
        dval = np.array([r["dval"] for r in rs])
        dtest = np.array([r["shipped_test"] - r["parity_test"] for r in rs])
        all_dval += list(dval)
        all_dtest += list(dtest)
        sv = np.median([r["shipped_val"] for r in rs])
        pv = np.median([r["parity_val"] for r in rs])
        print(f"| {bcb}-{task} | {len(rs)} | {np.median(dval):+.4f} | "
              f"[{dval.min():+.4f}, {dval.max():+.4f}] | "
              f"{np.median(dtest):+.4f} | {sv:.4f} | {pv:.4f} |")
    print(f"\npooled: n={len(all_dval)} pairs, median dval "
          f"{np.median(all_dval):+.4f}, mean {np.mean(all_dval):+.4f}, "
          f"median dtest {np.median(all_dtest):+.4f}, mean "
          f"{np.mean(all_dtest):+.4f}")
    w = np.sum(np.array(all_dval) > 0)
    eq = np.sum(np.array(all_dval) == 0)
    print(f"shipped wins val in {w}/{len(all_dval)} pairs "
          f"({eq} exact ties)")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/bf16check/matrix.jsonl")
