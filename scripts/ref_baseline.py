#!/usr/bin/env python
"""Measure the ACTUAL reference implementation's training-loop speed.

Grounds bench.py's ``vs_baseline`` denominator (round-2 VERDICT item #1):
imports the reference's own classes from /root/reference (Config,
ShapeNet1D, ANPShapeNet1D, LossFunc, ModelTrainer — `train.py:33-125`,
`trainer/model_trainer.py:33-93`) and runs them, PyTorch on CPU, against
the byte-compatible synthetic dataset in data_synth/.  Reports:

  - ``ref_tasks_per_sec``: the full reference loop (synchronous host
    episode sampling + forward + backward + Adam), timed over --iters
    real ``ModelTrainer.train()`` iterations.
  - ``sampling_bound_tasks_per_sec``: the reference samples episodes
    synchronously on the host inside the train loop
    (`trainer/model_trainer.py:64-70`); even an infinitely fast
    accelerator is therefore bounded by tasks_per_batch / t(get_batch).
    This is the honest upper bound for "reference on a GPU".

Caveats (recorded in BASELINE.md): CPU torch — no GPU exists in this
image; aug_list=["task_aug"] — imgaug is not installed, so data_aug is
omitted, which only makes the reference FASTER than its shipped DA+TA
config (both numbers are overestimates of the reference ⇒ vs_baseline
computed from them is an underestimate of ours).

Usage:
  python scripts/ref_baseline.py [--iters 200] [--sample-iters 200]
      [--val-freq 0] [--json-out PATH]
With --val-freq > 0 the run also keeps the reference's periodic
validation (for learning-curve extraction from log.log); the timed
throughput segment is always validation-free.
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=200,
                   help="timed full-loop training iterations")
    p.add_argument("--sample-iters", type=int, default=200,
                   help="iterations for the get_batch-only timing")
    p.add_argument("--val-freq", type=int, default=0,
                   help="if >0, run with reference validation cadence "
                        "(learning-curve mode; adds untimed overhead)")
    p.add_argument("--config", default="cfg_anp_shapenet1d_cpu.yaml")
    p.add_argument("--json-out", default=None)
    args = p.parse_args()

    os.chdir(os.path.join(REPO, "refbench"))
    sys.path.insert(0, os.path.join(REPO, "refbench", "stubs"))
    sys.path.insert(0, REFERENCE)

    import importlib
    import random

    import numpy as np
    import torch

    from configs.config import Config  # reference configs/config.py
    from dataset import ShapeNet1D  # reference dataset/__init__.py
    from trainer.losses import LossFunc
    from trainer.model_trainer import ModelTrainer

    config = Config(args.config)
    config.iterations = args.iters
    if args.val_freq > 0:
        config.val_freq = args.val_freq
    else:
        config.val_freq = 10 ** 9  # throughput mode: no validation

    # mirror train.py:35-39 seeding (imgaug is the stub)
    torch.manual_seed(config.seed)
    random.seed(config.seed)
    np.random.seed(config.seed)

    module = importlib.import_module(f"networks.{config.method}")
    model = getattr(module, config.method)(config).to(config.device)
    optimizer = getattr(torch.optim, config.optimizer)(
        model.parameters(), lr=config.lr)  # train.py:52-56 (no weight decay)

    data = ShapeNet1D(path="./data/ShapeNet1D", img_size=config.img_size,
                      seed=42, data_size=config.data_size,
                      aug=config.aug_list)  # train.py:74-79
    loss = LossFunc(loss_type=config.loss_type, task=config.task)

    # --- sampling-only bound -------------------------------------------
    # warmup one batch, then time the host episode sampler alone
    data.get_batch(source="train", tasks_per_batch=config.tasks_per_batch,
                   shot=config.max_ctx_num)
    t0 = time.perf_counter()
    for _ in range(args.sample_iters):
        data.get_batch(source="train",
                       tasks_per_batch=config.tasks_per_batch,
                       shot=config.max_ctx_num)
    sample_s = (time.perf_counter() - t0) / args.sample_iters

    # --- full reference loop -------------------------------------------
    trainer = ModelTrainer(model=model, loss=loss, optimizer=optimizer,
                           config=config, data=data)
    # one untimed warmup iteration (allocator warmup)
    trainer._train_iter(0)
    t0 = time.perf_counter()
    trainer.train()
    full_s = (time.perf_counter() - t0) / args.iters

    tpb = config.tasks_per_batch
    out = {
        "workload": f"{config.method} {config.task} "
                    f"aug={config.aug_list} T={tpb} ctx={config.max_ctx_num}",
        "device": str(config.device),
        "torch": torch.__version__,
        "cpu_count": os.cpu_count(),
        "iters": args.iters,
        "ref_ms_per_iter": round(1000 * full_s, 2),
        "ref_tasks_per_sec": round(tpb / full_s, 2),
        "sample_ms_per_batch": round(1000 * sample_s, 2),
        "sampling_bound_tasks_per_sec": round(tpb / sample_s, 2),
        "save_path": config.save_path,
    }
    print("REF_BASELINE " + json.dumps(out))
    if args.json_out:
        with open(os.path.join(REPO, args.json_out), "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
