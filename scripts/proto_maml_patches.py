#!/usr/bin/env python
"""Prototype: MAML inner loop with convs as patches+einsum batched matmuls.

Hypothesis (HLO evidence, RESULTS.md round 2): the vmapped per-task-weight
convs lower to grouped convolutions with layout copies around every call
(~15% of the step) and MXU-hostile shapes. conv_general_dilated_patches is
weight-FREE (vmaps to a plain batched op); the conv then becomes
einsum("tnhwk,tko->tnhwo", patches, per_task_w) — a native batched matmul.

Measures: current build_maml_outer vs the patches formulation, same config.
Also checks numerical agreement of one outer loss.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def patches_s(x, stride):
    """im2col for a 3x3/pad-1 conv: [N,H,W,C] -> [N,H',W',C*9]."""
    return lax.conv_general_dilated_patches(
        x, (3, 3), (stride, stride), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv_w_to_mat(w):
    """[3,3,Cin,Cout] -> [Cin*9, Cout] matching the patches' feature order
    (conv_general_dilated_patches emits (C, kh, kw)-major features)."""
    return jnp.transpose(w, (2, 0, 1, 3)).reshape(-1, w.shape[-1])


def main():
    import bench as B
    from wmfml_tpu.data.device_sampler import from_dataset
    from wmfml_tpu.data.factory import build_data
    from wmfml_tpu.models.registry import build_model
    from wmfml_tpu.models.maml import masked_batch_norm
    from wmfml_tpu.nn.encoders import max_pool_2x2
    from wmfml_tpu.parallel.mesh import MeshContext
    from wmfml_tpu.train.state import TrainState, build_optimizer
    from wmfml_tpu.train.maml import (MAMLTrainer,
                                      build_maml_device_train_step,
                                      build_maml_outer, partition_params)
    from wmfml_tpu.aug.pipeline import build_episode_processor
    from wmfml_tpu.losses import LossFunc

    cfg = B.base_cfg(method="MAMLShapeNet1D", aug_list=["data_aug"],
                     agg_mode=None, dim_w=196, num_filters=64, num_updates=5,
                     test_num_updates=20, first_order=False, update_lr=0.002,
                     beta=0.001, lr=5e-4, steps_per_call=4)
    cfg.donate = False   # the same state times both implementations
    data = build_data(cfg, mode="train")
    model = build_model(cfg)
    mesh_ctx = MeshContext.create(cfg.mesh_shape,
                                  batch_divisor=cfg.tasks_per_batch)
    tx = build_optimizer(cfg)
    key = jax.random.PRNGKey(0)
    tr = object.__new__(MAMLTrainer)
    tr.model, tr.config = model, cfg
    variables = MAMLTrainer._init_variables(tr, key)
    state = jax.device_put(TrainState.create(variables, tx),
                           mesh_ctx.replicated)
    sampler = from_dataset(data, cfg)

    # ------------- patches-based functional forward ----------------------
    bf16 = jnp.bfloat16
    loss_func = LossFunc(cfg.loss_type, cfg.task)
    process = build_episode_processor(cfg.task, cfg.aug_list, train=True,
                                      compute_dtype=bf16, azimuth_only=False)
    P = variables["params"]
    dim_hidden = 64

    def fwd(p, x, mask):
        """One task: x [N,128,128,1] -> [N,2]; p = flax param tree (bf16 views)."""
        e = p["encoder_w"]
        h = patches_s(x, 2) @ conv_w_to_mat(e["conv0"]["kernel"].astype(bf16))
        h = jnp.maximum(h + e["conv0"]["bias"].astype(bf16), 0)
        h = patches_s(h, 2) @ conv_w_to_mat(e["conv1"]["kernel"].astype(bf16))
        h = jnp.maximum(h + e["conv1"]["bias"].astype(bf16), 0)
        h = max_pool_2x2(h)
        h = patches_s(h, 2) @ conv_w_to_mat(e["conv2"]["kernel"].astype(bf16))
        h = jnp.maximum(h + e["conv2"]["bias"].astype(bf16), 0)
        h = h.reshape(h.shape[0], -1)
        h = h @ e["fc"]["Dense_0"]["kernel"].astype(bf16) + \
            e["fc"]["Dense_0"]["bias"].astype(bf16)
        h = h.reshape(-1, 14, 14, 1)
        for i in range(1, 5):
            pats = lax.conv_general_dilated_patches(
                h, (3, 3), (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            w = conv_w_to_mat(p[f"features_{i}_conv"]["kernel"].astype(bf16))
            h = pats @ w + p[f"features_{i}_conv"]["bias"].astype(bf16)
            h = masked_batch_norm(
                h, mask, p[f"features_{i}_bn_scale"].astype(bf16),
                p[f"features_{i}_bn_bias"].astype(bf16))
            h = jnp.maximum(h, 0)
        h = jnp.mean(h, axis=(1, 2))
        out = h @ p["regressor"]["Dense_0"]["kernel"].astype(bf16) + \
            p["regressor"]["Dense_0"]["bias"].astype(bf16)
        return jnp.tanh(out)

    adaptable_fn = model.adaptable_param_filter()
    update_lr = float(cfg.update_lr)
    from flax import traverse_util

    def outer(params, batch, key2):
        k_aug, _ = jax.random.split(key2)
        pb = process(k_aug, batch)
        adapt0, frozen = partition_params(params, adaptable_fn)

        def merge(a):
            return traverse_util.unflatten_dict({**a, **frozen})

        def per_task(ctx_x, ctx_y, qry_x, qry_y, mask):
            def inner_loss(a):
                out = fwd(merge(a), ctx_x, mask)
                return loss_func.calc_loss(out, None, ctx_y, test=False,
                                           mask=mask)

            a = adapt0
            for _ in range(int(cfg.num_steps)):
                g = jax.grad(inner_loss)(a)
                a = {k: a[k] - update_lr * g[k] for k in a}
            out = fwd(merge(a), qry_x, None)
            return loss_func.calc_loss(out, None, qry_y, test=False)

        losses = jax.vmap(per_task)(pb["ctx_x"], pb["ctx_y"], pb["qry_x"],
                                    pb["qry_y"], pb["ctx_mask"])
        return jnp.mean(losses)

    import optax

    def one_step(state, inputs):
        batch, k2 = inputs
        loss, grads = jax.value_and_grad(
            lambda p: outer(p, batch, k2))(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (state.replace(step=state.step + 1, params=params,
                              opt_state=new_opt), loss)

    def fused(state, arrays, k2):
        ks, kf = jax.random.split(k2)
        batches = jax.vmap(lambda k: sampler.sample(k, cfg.tasks_per_batch,
                                                    arrays)
                           )(jax.random.split(ks, cfg.steps_per_call))
        keys = jax.random.split(kf, cfg.steps_per_call)
        state, losses = jax.lax.scan(one_step, state, (batches, keys))
        return state, jnp.mean(losses)

    repl = mesh_ctx.replicated
    patches_step = jax.jit(fused, in_shardings=(repl, repl, repl),
                           out_shardings=(repl, repl), donate_argnums=())

    # ------------- baseline (current implementation) ----------------------
    cur_outer = build_maml_outer(model, cfg, int(cfg.num_steps), train=True,
                                 test=False)
    cur_step = build_maml_device_train_step(model, cfg, sampler, mesh_ctx,
                                            tx, cfg.steps_per_call, cur_outer)

    arrays = sampler.arrays()

    def timeit(f, s, n=8):
        s2, m = f(s, jax.random.fold_in(key, 1))
        _ = float(jax.tree_util.tree_leaves(m)[0])
        t0 = time.perf_counter()
        for i in range(n):
            s2, m = f(s2, jax.random.fold_in(key, 10 + i))
        _ = float(jax.tree_util.tree_leaves(m)[0])
        dt = (time.perf_counter() - t0) / (n * cfg.steps_per_call) * 1e3
        return dt

    ms_cur = timeit(cur_step, state)
    print(f"current  : {ms_cur:7.2f} ms/step "
          f"({1000 / ms_cur * cfg.tasks_per_batch:.1f} tasks/s)", flush=True)
    ms_pat = timeit(lambda s, k: patches_step(s, arrays, k), state)
    print(f"patches  : {ms_pat:7.2f} ms/step "
          f"({1000 / ms_pat * cfg.tasks_per_batch:.1f} tasks/s)", flush=True)

    # numeric agreement of a single outer loss (bf16 tolerances)
    batch = sampler.sample(jax.random.fold_in(key, 99), cfg.tasks_per_batch)
    l_cur, _ = cur_outer(state.params, batch, jax.random.fold_in(key, 7))
    l_pat = outer(state.params, batch, jax.random.fold_in(key, 7))
    print(f"outer loss: current {float(l_cur):.5f} patches {float(l_pat):.5f}")


if __name__ == "__main__":
    main()
