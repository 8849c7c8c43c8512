#!/usr/bin/env python
"""Cross-framework learning-curve comparison (round-2 VERDICT #1 bonus).

Parses validation/test degree-error curves from
  * a reference run's log.log   (lines: "validation 250 loss: 22.69",
    written by trainer/model_trainer.py:127)
  * a wmfml_tpu run's log.log   (lines: "[validation] iteration 250: loss 22.69")
and writes a side-by-side figure + a markdown table. Both runs must use the
same task/config (ANP ShapeNet1D, task_aug only, synthetic data).

Usage:
  python scripts/curve_compare.py <reference_log> <wmfml_log> \
      --out results/curve_compare
"""

import argparse
import os
import re

REF_RE = re.compile(r"^(validation|test) (\d+) loss: ([\d.]+)")
OUR_RE = re.compile(r"^\[(validation|test)\] iteration (\d+): loss ([\d.]+)")


def parse(path, regex):
    out = {"validation": [], "test": []}
    with open(path) as f:
        for line in f:
            m = regex.match(line.strip())
            if m:
                out[m.group(1)].append((int(m.group(2)), float(m.group(3))))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ref_log")
    ap.add_argument("our_log")
    ap.add_argument("--out", default="results/curve_compare")
    args = ap.parse_args()

    ref = parse(args.ref_log, REF_RE)
    ours = parse(args.our_log, OUR_RE)
    os.makedirs(args.out, exist_ok=True)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(11, 4))
    for ax, split in zip(axes, ("validation", "test")):
        if ref[split]:
            xs, ys = zip(*ref[split])
            ax.plot(xs, ys, "o-", label="reference (torch CPU)")
        if ours[split]:
            xs, ys = zip(*ours[split])
            ax.plot(xs, ys, "s-", label="wmfml_tpu (TPU)")
        ax.set_title(f"{split} degree error vs iteration")
        ax.set_xlabel("iteration")
        ax.set_ylabel("mean angular error (deg)")
        ax.grid(alpha=0.3)
        ax.legend()
    fig.tight_layout()
    fig.savefig(os.path.join(args.out, "curve_compare.png"), dpi=120)

    with open(os.path.join(args.out, "curve_compare.md"), "w") as f:
        f.write("| iteration | ref val | ref test | ours val | ours test |\n")
        f.write("|---|---|---|---|---|\n")
        ref_v = dict(ref["validation"])
        ref_t = dict(ref["test"])
        our_v = dict(ours["validation"])
        our_t = dict(ours["test"])
        for it in sorted(set(ref_v) | set(our_v)):
            f.write(f"| {it} | {ref_v.get(it, '')} | {ref_t.get(it, '')} | "
                    f"{our_v.get(it, '')} | {our_t.get(it, '')} |\n")
    print("wrote", args.out)


if __name__ == "__main__":
    main()
