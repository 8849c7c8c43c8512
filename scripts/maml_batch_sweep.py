#!/usr/bin/env python
"""MAML/MMAML throughput-optimal batch search (VERDICT r4 item 4).

The vmap'd inner loop is embarrassingly parallel over tasks; at the
measured 5-6% MFU of the T=10 reference batch the fixed per-dispatch cost
should amortize well past T=10. Sweeps tasks_per_batch in one interleaved
window (all variants AOT-compiled first, then timed round-robin so a
platform drift hits every variant equally) and reports tasks/s + ms/step.

Reference workload being scaled: the serial per-task torchmeta loop at
`trainer/maml_trainer.py:114-170` (T=10 there, by necessity: its cost is
linear in T).

Usage: python scripts/maml_batch_sweep.py [maml|mmaml|both] \
           [--batches 10,20,40,80] [--rounds 3] [--calls 2]
Writes results/profiles/maml_batch_sweep.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

import bench as B  # noqa: E402


def build(method: str, t: int):
    kw = dict(
        aug_list=["data_aug"], agg_mode=None, dim_w=196, num_filters=64,
        num_updates=5, test_num_updates=20, first_order=False,
        update_lr=0.002, beta=0.001, lr=5e-4, steps_per_call=4,
        tasks_per_batch=t)
    if method == "mmaml":
        kw["aug_list"] = ["data_aug", "task_aug"]
        cfg = B.base_cfg(method="MMAMLShapeNet1D", **kw)
    else:
        cfg = B.base_cfg(method="MAMLShapeNet1D", **kw)
    step, state, K = B.build_step(cfg)
    arrays = step._arrays()
    compiled = step._jitted.lower(state, arrays,
                                  jax.random.PRNGKey(0)).compile()
    return dict(cfg=cfg, compiled=compiled, state=state, arrays=arrays, K=K)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("which", nargs="?", default="both",
                    choices=["maml", "mmaml", "both"])
    ap.add_argument("--batches", default="10,20,40,80")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--calls", type=int, default=2)
    ap.add_argument("--out", default="results/profiles/maml_batch_sweep.json")
    args = ap.parse_args()

    methods = ["maml", "mmaml"] if args.which == "both" else [args.which]
    batches = [int(x) for x in args.batches.split(",")]

    variants = {}
    for m in methods:
        for t in batches:
            name = f"{m}_T{t}"
            print(f"[sweep] compiling {name} ...", flush=True)
            try:
                variants[name] = build(m, t)
            except Exception as e:  # degraded compile windows: keep going
                print(f"[sweep] {name} failed to build: "
                      f"{type(e).__name__}: {e}"[:200], flush=True)

    # warmup every variant (fetch-synced)
    for name, v in variants.items():
        s, metrics = v["compiled"](v["state"], v["arrays"],
                                   jax.random.PRNGKey(1))
        v["state"] = s
        _ = float(metrics["loss"])

    acc = {name: 0.0 for name in variants}
    steps = {name: 0 for name in variants}
    for r in range(args.rounds):
        for name, v in variants.items():
            t0 = time.perf_counter()
            s = v["state"]
            for i in range(args.calls):
                s, metrics = v["compiled"](
                    s, v["arrays"],
                    jax.random.fold_in(jax.random.PRNGKey(100 + r), i))
            _ = float(metrics["loss"])  # the real sync point
            v["state"] = s
            acc[name] += time.perf_counter() - t0
            steps[name] += args.calls * v["K"]

    out = []
    for name, v in variants.items():
        t = v["cfg"].tasks_per_batch
        tasks_s = steps[name] * t / acc[name]
        out.append(dict(variant=name, tasks_per_batch=t,
                        ms_per_step=round(1e3 * acc[name] / steps[name], 2),
                        tasks_per_sec=round(tasks_s, 1)))
        print(f"[sweep] {name}: {out[-1]['ms_per_step']} ms/step, "
              f"{out[-1]['tasks_per_sec']} tasks/s", flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"[sweep] wrote {args.out}")


if __name__ == "__main__":
    main()
