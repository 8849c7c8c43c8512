#!/usr/bin/env python
"""Headline benchmark: meta-train task throughput (tasks/sec/chip).

Workload: the flagship ANP ShapeNet1D configuration (cross-attention +
DA + TA — BASELINE.json configs[1]) at the reference's production batch
(tasks_per_batch=10, max_ctx=15, 128x128 images), full training step:
device-side augmentation + forward + backward + Adam update, bfloat16
compute. Episodes are sampled host-side exactly as in training and staged
through the same prefetch path.

vs_baseline: the reference publishes no numbers (BASELINE.md). We use a
*generous* estimate for its single-GPU throughput: ~10 iters/s x 10
tasks/iter = 100 tasks/s (synchronous imgaug CPU sampling + torch conv
forward/backward; the paper's setup, README.md:13). The north-star target is
>= 10x => vs_baseline >= 10.
"""

from __future__ import annotations

import json
import time

import numpy as np

REFERENCE_TASKS_PER_SEC = 100.0


def main():
    import jax

    from wmfml_tpu.configs import Config
    from wmfml_tpu.data.factory import build_data
    from wmfml_tpu.models.registry import build_model
    from wmfml_tpu.parallel.mesh import MeshContext
    from wmfml_tpu.train.state import TrainState, build_optimizer
    from wmfml_tpu.train.steps import build_train_step, init_model

    import numpy as np

    from wmfml_tpu.train.steps import build_multi_train_step

    K = 16  # training steps fused per dispatch (steps_per_call)
    cfg = Config.from_dict(dict(
        method="ANPShapeNet1D", task="shapenet_1d",
        aug_list=["task_aug", "data_aug"], checkpoint="",
        agg_mode="attention", loss_type="mse", tasks_per_batch=10,
        max_ctx_num=15, query_num=15, data_size="small", dim_w=64,
        n_hidden_units_r=[100, 100], dim_r=64, dim_z=64, noise_scale=0.0,
        lr=1e-4, weight_decay=False, optimizer="Adam", bg_gen_freq=1000,
        val_iters=1, val_freq=10**9, iterations=1, device="tpu", seed=0,
        synthetic_data=True, steps_per_call=K,
    ), make_dirs=False)

    data = build_data(cfg, mode="train")
    model = build_model(cfg)
    mesh_ctx = MeshContext.create(cfg.mesh_shape,
                                  batch_divisor=cfg.tasks_per_batch)
    tx = build_optimizer(cfg)
    key = jax.random.PRNGKey(0)
    variables = init_model(model, cfg, key)
    state = jax.device_put(TrainState.create(variables, tx),
                           mesh_ctx.replicated)
    train_step = build_multi_train_step(model, cfg, mesh_ctx, tx, K)

    def stack_batches():
        eps = [data.get_batch("train", cfg.tasks_per_batch, cfg.max_ctx_num)
               for _ in range(K)]
        stacked = {k: np.stack([e[k] for e in eps]) for k in eps[0]}
        from jax.sharding import NamedSharding, PartitionSpec as P

        sh = NamedSharding(mesh_ctx.mesh, P(None, "data"))
        return jax.device_put(stacked, sh)

    batches = [stack_batches() for _ in range(3)]

    # warmup / compile
    for i in range(2):
        state, metrics = train_step(state, batches[i % 3],
                                    jax.random.fold_in(key, i))
    jax.block_until_ready(metrics["loss"])

    calls = 8
    t0 = time.perf_counter()
    for i in range(calls):
        state, metrics = train_step(state, batches[i % 3],
                                    jax.random.fold_in(key, 100 + i))
    jax.block_until_ready(metrics["loss"])
    dt = time.perf_counter() - t0

    tasks_per_sec = calls * K * cfg.tasks_per_batch / dt
    result = {
        "metric": "meta_train_tasks_per_sec_per_chip",
        "value": round(float(tasks_per_sec), 2),
        "unit": "tasks/s",
        "vs_baseline": round(float(tasks_per_sec / REFERENCE_TASKS_PER_SEC), 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
