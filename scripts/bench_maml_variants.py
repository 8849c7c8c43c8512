#!/usr/bin/env python
"""Measure MAML/MMAML outer-step variants on the real chip.

Production workload (cfg/train/MAML_DA_ShapeNet1D.yaml): T=10 tasks,
5 inner steps, second order, dim_w=196, ctx 15 / qry 15, 128x128 images,
data_aug. Timing forces a host fetch of the loss (block_until_ready does
not block on this platform — RESULTS.md "Measurement integrity").

Usage: python scripts/bench_maml_variants.py [maml|mmaml] [variants...]
Variant syntax: remat=<none|step|dots>,unroll=<0|1>,dtype=<float32|bfloat16>
"""

from __future__ import annotations

import sys
import time

import jax


def base_cfg(method):
    from wmfml_tpu.configs import Config
    return Config.from_dict(dict(
        method=method, task="shapenet_1d", aug_list=["data_aug"],
        checkpoint="", loss_type="mse", tasks_per_batch=10, max_ctx_num=15,
        query_num=15, data_size="large", dim_w=196, num_filters=64,
        num_updates=5, test_num_updates=20, first_order=False,
        update_lr=0.002, beta=0.001, lr=5e-4, weight_decay=False,
        optimizer="Adam", bg_gen_freq=1000, val_iters=1, val_freq=10**9,
        iterations=1, device="tpu", seed=0, synthetic_data=True,
        steps_per_call=4, compute_dtype="float32",
    ), make_dirs=False)


def time_variant(method, spec: str, calls: int = 8):
    from wmfml_tpu.data.device_sampler import from_dataset
    from wmfml_tpu.data.factory import build_data
    from wmfml_tpu.models.registry import build_model
    from wmfml_tpu.parallel.mesh import MeshContext
    from wmfml_tpu.train.state import TrainState, build_optimizer

    cfg = base_cfg(method)
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

    data = build_data(cfg, mode="train")
    model = build_model(cfg)
    mesh_ctx = MeshContext.create(cfg.mesh_shape,
                                  batch_divisor=cfg.tasks_per_batch)
    tx = build_optimizer(cfg)
    key = jax.random.PRNGKey(0)
    sampler = from_dataset(data, cfg)
    assert sampler is not None
    K = cfg.steps_per_call

    if method == "MMAMLShapeNet1D":
        from wmfml_tpu.train.mmaml import (build_mmaml_device_train_step,
                                           build_mmaml_optimizer,
                                           build_mmaml_outer)
        from wmfml_tpu.train.mmaml import MMAMLTrainer

        bundle = model
        tx = build_mmaml_optimizer(cfg)
        # init via the trainer's logic, minus driver side effects
        tr = object.__new__(MMAMLTrainer)
        tr.bundle, tr.config = bundle, cfg
        variables = MMAMLTrainer._init_variables(tr, key)
        state = jax.device_put(TrainState.create(variables, tx),
                               mesh_ctx.replicated)
        outer = build_mmaml_outer(bundle, cfg, int(cfg.num_steps),
                                  train=True, test=False)
        step = build_mmaml_device_train_step(bundle, cfg, sampler, mesh_ctx,
                                             tx, K, outer)
    else:
        from wmfml_tpu.train.maml import (MAMLTrainer,
                                          build_maml_device_train_step,
                                          build_maml_outer)
        tr = object.__new__(MAMLTrainer)
        tr.model, tr.config = model, cfg
        variables = MAMLTrainer._init_variables(tr, key)
        state = jax.device_put(TrainState.create(variables, tx),
                               mesh_ctx.replicated)
        outer = build_maml_outer(model, cfg, int(cfg.num_steps),
                                 train=True, test=False)
        step = build_maml_device_train_step(model, cfg, sampler, mesh_ctx,
                                            tx, K, outer)

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
        "remat=none,unroll=0",        # fully unrolled
        "remat=dots,unroll=0",
        "remat=none,unroll=0,dtype=bfloat16",
    ]
    for spec in variants:
        time_variant(method, spec)
