#!/usr/bin/env python
"""ANPMR KL-weight (beta) sensitivity on synthetic ShapeNet3D (VERDICT r4
item 5).

Round-4 matrix: ANPMR-3D test quat L1 0.625 vs plain ANP 0.368 at the
shipped beta=1e-7 on the 240-item synthetic split. The working explanation
is that BBB weight noise regularizes a real-data overfitting mode that
synthetic tasks don't exhibit, so the KL tax buys nothing here. beta is THE
hyperparameter of the family (`networks/bbb/BBBConv.py:104-108`, KL summed
into the loss at `trainer/model_trainer.py:78`): a 3-point sweep
(beta/10, beta, beta*10) substantiates or refutes that claim.

    python scripts/anpmr_beta_sweep.py [--iters 20000] [--betas 1e-8,1e-7,1e-6]
Appends rows to matrix_r4.json (stage anpmr_3d_beta_<beta>).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=20000)
    p.add_argument("--betas", default="1e-8,1e-7,1e-6")
    args = p.parse_args()

    from scripts.matrix_r4 import FAST, _train

    for beta in args.betas.split(","):
        _train("cfg/train/ANPMR_ShapeNet3D.yaml",
               [f"iterations={args.iters}", f"beta={float(beta)}"] + FAST,
               f"anpmr_3d_beta_{beta}")


if __name__ == "__main__":
    main()
