#!/usr/bin/env python
"""FCL regression investigation (VERDICT round 3 #5): sweep
contrastive_rate x temperature for FCLANP on the 240-item synthetic
ShapeNet3D split vs the plain-ANP control, 20k iterations each.

Round-3 matrix recorded FCLANP test quat L1 0.544 vs plain ANP 0.368 on the
same split — on real data the paper's claim is that FCL *helps*
(networks/FCLANP.py:101-137, cfg/train/contrastive/). This sweep answers
whether the regression is (a) a bad (rate, temperature) for synthetic tasks
or (b) structural: synthetic tasks may lack the cross-instance appearance
structure NT-Xent exploits.

    python scripts/fcl_sweep.py [--iters 20000] [--out fcl_sweep.json]

Each run trains via the real ModelTrainer (device-resident fused path) and
reports the best test loss; a rate=0 run is the ANP-equivalent control.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run_one(rate: float, temperature: float, iters: int, seed: int = 2578):
    from wmfml_tpu.cli.train_cli import train
    from wmfml_tpu.configs import Config

    config = Config("cfg/train/contrastive/FCLANP_DA+TA_ShapeNet3D.yaml",
                    overrides=[
                        f"contrastive_rate={rate}",
                        f"temperature={temperature}",
                        f"iterations={iters}",
                        f"seed={seed}",
                        "val_freq=2048", "val_iters=10",
                        "steps_per_call=64", "compute_dtype=bfloat16",
                    ])
    t0 = time.time()
    train(config)
    wall = time.time() - t0
    best = {}
    for split in ("validation", "test"):
        p = os.path.join(config.save_path, f"best_{split}_error.txt")
        if os.path.exists(p):
            txt = open(p).read().strip()
            best[split] = float(txt.rsplit(":", 1)[1])
    return dict(rate=rate, temperature=temperature, iters=iters,
                wall_s=round(wall, 1), best=best,
                run_dir=config.save_path)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=20000)
    p.add_argument("--out", default="fcl_sweep.json")
    p.add_argument("--rates", default="0,0.1,1,10")
    p.add_argument("--temps", default="0.007,0.07,0.5")
    args = p.parse_args()

    rates = [float(x) for x in args.rates.split(",")]
    temps = [float(x) for x in args.temps.split(",")]
    results = []
    for rate in rates:
        # rate=0 is the ANP control: the contrastive term contributes
        # nothing, temperature is irrelevant — run it once
        tlist = temps if rate > 0 else temps[:1]
        for temp in tlist:
            print(f"[fcl_sweep] rate={rate} temperature={temp} ...",
                  flush=True)
            r = run_one(rate, temp, args.iters)
            print(f"[fcl_sweep]   -> best {r['best']} ({r['wall_s']}s)",
                  flush=True)
            results.append(r)
            with open(args.out, "w") as f:
                json.dump(results, f, indent=1)
    print(f"[fcl_sweep] wrote {args.out}")


if __name__ == "__main__":
    main()
