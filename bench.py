#!/usr/bin/env python
"""Headline benchmark: meta-train task throughput (tasks/sec/chip).

Workload: the flagship ANP ShapeNet1D configuration (FAVOR+ cross-attention
+ DA + TA — BASELINE.json configs[1]) at the reference's production batch
(tasks_per_batch=10, max_ctx=15, 128x128 images). TRUE end-to-end training:
the split is device-resident, episodes are sampled on device (XLA gathers
from PRNG keys), augmentation + forward + backward + Adam update all run in
fused 16-step dispatches. Timing forces a host fetch of the final loss —
on this platform ``block_until_ready`` returns before remote execution
completes, so fetch-based timing is the only honest clock.

vs_baseline: the reference publishes no numbers (BASELINE.md). We use a
generous estimate of its single-GPU loop: ~10 iters/s x 10 tasks = 100
tasks/s (synchronous imgaug CPU sampling + torch forward/backward). The
north-star target is >= 10x => vs_baseline >= 10.
"""

from __future__ import annotations

import json
import time

REFERENCE_TASKS_PER_SEC = 100.0


def main():
    import jax

    from wmfml_tpu.configs import Config
    from wmfml_tpu.data.device_sampler import from_dataset
    from wmfml_tpu.data.factory import build_data
    from wmfml_tpu.models.registry import build_model
    from wmfml_tpu.parallel.mesh import MeshContext
    from wmfml_tpu.train.state import TrainState, build_optimizer
    from wmfml_tpu.train.steps import build_device_data_train_step, init_model

    K = 16  # training steps fused per dispatch
    cfg = Config.from_dict(dict(
        method="ANPShapeNet1D", task="shapenet_1d",
        aug_list=["task_aug", "data_aug"], checkpoint="",
        agg_mode="attention", loss_type="mse", tasks_per_batch=10,
        max_ctx_num=15, query_num=15, data_size="large", dim_w=64,
        n_hidden_units_r=[100, 100], dim_r=64, dim_z=64, noise_scale=0.0,
        lr=1e-4, weight_decay=False, optimizer="Adam", bg_gen_freq=1000,
        val_iters=1, val_freq=10**9, iterations=1, device="tpu", seed=0,
        synthetic_data=True, steps_per_call=K, compute_dtype="bfloat16",
    ), make_dirs=False)

    data = build_data(cfg, mode="train")
    model = build_model(cfg)
    mesh_ctx = MeshContext.create(cfg.mesh_shape,
                                  batch_divisor=cfg.tasks_per_batch)
    tx = build_optimizer(cfg)
    key = jax.random.PRNGKey(0)
    state = jax.device_put(
        TrainState.create(init_model(model, cfg, key), tx),
        mesh_ctx.replicated)
    sampler = from_dataset(data, cfg)
    assert sampler is not None, "train split must fit in HBM for this bench"
    train_step = build_device_data_train_step(model, cfg, sampler, mesh_ctx,
                                              tx, K)

    # warmup / compile (fetch forces completion)
    for i in range(2):
        state, metrics = train_step(state, jax.random.fold_in(key, i))
    _ = float(metrics["loss"])

    calls = 25
    t0 = time.perf_counter()
    for i in range(calls):
        state, metrics = train_step(state, jax.random.fold_in(key, 100 + i))
    final_loss = float(metrics["loss"])  # real sync point
    dt = time.perf_counter() - t0

    assert final_loss == final_loss  # NaN guard on the benchmark itself
    tasks_per_sec = calls * K * cfg.tasks_per_batch / dt
    print(json.dumps({
        "metric": "meta_train_tasks_per_sec_per_chip",
        "value": round(float(tasks_per_sec), 2),
        "unit": "tasks/s",
        "vs_baseline": round(float(tasks_per_sec / REFERENCE_TASKS_PER_SEC), 3),
    }))


if __name__ == "__main__":
    main()
