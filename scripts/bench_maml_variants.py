#!/usr/bin/env python
"""Measure MAML/MMAML outer-step variants on the real chip.

Production workload (cfg/train/MAML_DA_ShapeNet1D.yaml): T=10 tasks,
5 inner steps, second order, dim_w=196, ctx 15 / qry 15, 128x128 images,
data_aug. Timing forces a host fetch of the loss (block_until_ready does
not block on this platform — RESULTS.md "Measurement integrity").

Workload construction is shared with bench.py (base_cfg/build_step).

Usage: python scripts/bench_maml_variants.py [maml|mmaml] [variants...]
Variant syntax: remat=<none|step|dots>,unroll=<0|1>,dtype=<float32|bfloat16>
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

import bench as B  # noqa: E402


def time_variant(method: str, spec: str, calls: int = 8):
    cfg = B.base_cfg(
        method=method, aug_list=["data_aug"], agg_mode=None, dim_w=196,
        num_filters=64, num_updates=5, test_num_updates=20,
        first_order=False, update_lr=0.002, beta=0.001, lr=5e-4,
        steps_per_call=4, compute_dtype="float32")
    for kv in spec.split(","):
        k, _, v = kv.partition("=")
        if k == "remat":
            cfg.maml_remat = v
        elif k == "unroll":
            cfg.maml_unroll = int(v)
        elif k == "dtype":
            cfg.compute_dtype = v
        elif k == "steps":
            cfg.num_steps = int(v)
        elif k == "T":
            cfg.tasks_per_batch = int(v)

    step, state, K = B.build_step(cfg)
    key = jax.random.PRNGKey(0)

    t0 = time.perf_counter()
    for i in range(2):
        state, metrics = step(state, jax.random.fold_in(key, i))
    loss0 = float(metrics["loss"])
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for i in range(calls):
        state, metrics = step(state, jax.random.fold_in(key, 100 + i))
    loss = float(metrics["loss"])
    dt = time.perf_counter() - t0
    steps = calls * K
    ms = 1000 * dt / steps
    tps = steps * cfg.tasks_per_batch / dt
    print(f"{method:16s} {spec:44s} {ms:8.2f} ms/step {tps:8.1f} tasks/s "
          f"(loss {loss:.4f}, compile {compile_s:.0f}s)", flush=True)
    return tps


if __name__ == "__main__":
    method = {"maml": "MAMLShapeNet1D",
              "mmaml": "MMAMLShapeNet1D"}[sys.argv[1] if len(sys.argv) > 1
                                          else "maml"]
    variants = sys.argv[2:] or [
        "remat=step,unroll=1",        # round-1 behavior
        "remat=none,unroll=1",
        "remat=none,unroll=0",        # fully unrolled (default)
        "remat=none,unroll=0,dtype=bfloat16",
    ]
    for spec in variants:
        time_variant(method, spec)
