"""Jitted train/eval steps.

Each step is one SPMD program over the mesh: device-side augmentation + the
full forward/backward + optimizer update, jitted once (static shapes via
padded episodes) with the task axis sharded over "data" and the state
replicated. XLA inserts the gradient all-reduce over ICI automatically.

Loss composition mirrors trainer/model_trainer.py:72-81:
    total = task_loss + beta * kl [+ contrastive_rate * contra_loss]
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from wmfml_tpu.aug.pipeline import build_episode_processor
from wmfml_tpu.losses import LossFunc, contrastive_loss, contrastive_loss_anp
from wmfml_tpu.parallel.mesh import MeshContext
from wmfml_tpu.train.state import TrainState, build_optimizer


def _compute_dtype(config):
    return jnp.bfloat16 if config.compute_dtype == "bfloat16" else jnp.float32


def _model_rngs(key):
    kd, kb = jax.random.split(key)
    return {"dropout": kd, "bbb": kb}


def make_forward(model, config, train: bool):
    """process-batch + model apply, shared by train/eval/MAML paths."""
    process = build_episode_processor(
        config.task, config.aug_list if train else [], train=train,
        compute_dtype=_compute_dtype(config),
        azimuth_only="azimuth_only" in config.aug_list,
        aug_random_order=getattr(config, "aug_random_order", True))

    def forward(variables, batch, key):
        k_aug, k_model = jax.random.split(key)
        batch = process(k_aug, batch)
        out = model.apply(variables, batch["ctx_x"], batch["ctx_y"],
                          batch["qry_x"], ctx_mask=batch["ctx_mask"],
                          train=train, qry_y=batch["qry_y"],
                          rngs=_model_rngs(k_model))
        return out, batch

    return forward


def _contra_term(config, out, batch):
    """FCL contrastive term (trainer/model_trainer.py:72-81 composition)."""
    if not config.contrastive:
        return 0.0
    ex = out.extras
    if "z_ctx_view" in ex and "z_qry_view" in ex:   # FCL-CNP two-view
        return contrastive_loss(ex["z_ctx_view"], ex["z_qry_view"],
                                t=config.temperature)
    if "qry_rep" in ex:                             # FCL-ANP per-task
        return contrastive_loss_anp(ex["qry_rep"], t=config.temperature)
    return 0.0


def build_train_step(model, config, mesh_ctx: Optional[MeshContext] = None,
                     tx: Optional[optax.GradientTransformation] = None,
                     state_sharding=None) -> Callable:
    """state_sharding: optional TrainState sharding pytree (tensor-parallel
    placements from parallel.mesh.state_shardings); default replicated."""
    tx = tx or build_optimizer(config)
    loss_func = LossFunc(config.loss_type, config.task)
    forward = make_forward(model, config, train=True)
    beta = float(config.beta or 0.0)
    contrastive_rate = float(config.contrastive_rate or 0.0)

    def train_step(state: TrainState, batch, key):
        def loss_fn(params):
            variables = {"params": params, **state.extra_vars}
            out, pbatch = forward(variables, batch, key)
            task_loss = loss_func.calc_loss(
                out.mu.astype(jnp.float32), out.var, pbatch["qry_y"],
                test=False)
            total = task_loss + beta * out.kl
            contra = _contra_term(config, out, pbatch)
            total = total + contrastive_rate * contra
            return total, {"loss": total, "task_loss": task_loss,
                           "kl": out.kl, "contra": contra}
        grads, metrics = jax.grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  opt_state=new_opt)
        return new_state, metrics

    if mesh_ctx is None:
        return jax.jit(train_step, donate_argnums=(0,) if config.donate else ())

    repl, data = mesh_ctx.replicated, mesh_ctx.data_sharding
    st = state_sharding if state_sharding is not None else repl
    batch_shardings = dict(ctx_x=data, ctx_y=data, ctx_mask=data,
                           qry_x=data, qry_y=data)
    return jax.jit(
        train_step,
        in_shardings=(st, batch_shardings, repl),
        out_shardings=(st, repl),
        donate_argnums=(0,) if config.donate else (),
    )


def build_multi_train_step(model, config, mesh_ctx: Optional[MeshContext],
                           tx: Optional[optax.GradientTransformation],
                           steps_per_call: int) -> Callable:
    """K training steps fused into one dispatch via lax.scan.

    At reference batch sizes a single step is ~0.1 ms of TPU compute under
    ~0.7 ms of host dispatch; scanning K pre-staged episode batches inside
    one jitted call amortizes the dispatch to nothing. Batches arrive stacked
    on a leading K axis ([K, T, ...], task axis sharded over "data").
    Returns (state, metrics-of-last-step with loss averaged over K).
    """
    tx = tx or build_optimizer(config)
    loss_func = LossFunc(config.loss_type, config.task)
    forward = make_forward(model, config, train=True)
    beta = float(config.beta or 0.0)
    contrastive_rate = float(config.contrastive_rate or 0.0)

    def one_step(state, batch_key):
        batch, key = batch_key

        def loss_fn(params):
            variables = {"params": params, **state.extra_vars}
            out, pbatch = forward(variables, batch, key)
            task_loss = loss_func.calc_loss(
                out.mu.astype(jnp.float32), out.var, pbatch["qry_y"],
                test=False)
            total = task_loss + beta * out.kl
            total = total + contrastive_rate * _contra_term(config, out, pbatch)
            return total
        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=new_params,
                             opt_state=new_opt), loss

    def multi_step(state, batches, key):
        keys = jax.random.split(key, steps_per_call)
        state, losses = jax.lax.scan(one_step, state, (batches, keys))
        return state, {"loss": jnp.mean(losses), "last_loss": losses[-1]}

    if mesh_ctx is None:
        return jax.jit(multi_step, donate_argnums=(0,) if config.donate else ())
    repl = mesh_ctx.replicated
    from jax.sharding import NamedSharding, PartitionSpec as P

    data_k = NamedSharding(mesh_ctx.mesh, P(None, "data"))
    bs = dict(ctx_x=data_k, ctx_y=data_k, ctx_mask=data_k, qry_x=data_k,
              qry_y=data_k)
    return jax.jit(multi_step, in_shardings=(repl, bs, repl),
                   out_shardings=(repl, repl),
                   donate_argnums=(0,) if config.donate else ())


def build_device_data_train_step(model, config, sampler,
                                 mesh_ctx: Optional[MeshContext],
                                 tx: Optional[optax.GradientTransformation],
                                 steps_per_call: int) -> Callable:
    """K training steps with ON-DEVICE episode sampling, one dispatch.

    The split lives in HBM (wmfml_tpu.data.device_sampler); each scanned step
    draws its episode with XLA gathers from a PRNG key. Host traffic per call:
    one key. Signature: step(state, key) -> (state, metrics).
    """
    tx = tx or build_optimizer(config)
    loss_func = LossFunc(config.loss_type, config.task)
    forward = make_forward(model, config, train=True)
    beta = float(config.beta or 0.0)
    contrastive_rate = float(config.contrastive_rate or 0.0)
    data_sharding = mesh_ctx.data_sharding if mesh_ctx else None

    def one_step(state, inputs):
        batch, k_fwd = inputs

        def loss_fn(params):
            variables = {"params": params, **state.extra_vars}
            out, pbatch = forward(variables, batch, k_fwd)
            task_loss = loss_func.calc_loss(
                out.mu.astype(jnp.float32), out.var, pbatch["qry_y"],
                test=False)
            total = task_loss + beta * out.kl
            return total + contrastive_rate * _contra_term(config, out, pbatch)
        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=new_params,
                             opt_state=new_opt), loss

    def fused(state, arrays, key):
        k_sample, k_fwd = jax.random.split(key)
        # one big gather for all K episodes (amortizes XLA gather overhead
        # vs per-step gathers inside the scan); split tensors arrive as
        # arguments — closure capture would bake them into the module as
        # constants (host round-trip at lowering, see DeviceSplit.arrays)
        batches = jax.vmap(
            lambda k: sampler.sample(k, config.tasks_per_batch, arrays)
        )(jax.random.split(k_sample, steps_per_call))
        if data_sharding is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            sh = NamedSharding(mesh_ctx.mesh, P(None, "data"))
            batches = jax.lax.with_sharding_constraint(
                batches, {k: sh for k in batches})
        keys = jax.random.split(k_fwd, steps_per_call)
        state, losses = jax.lax.scan(one_step, state, (batches, keys))
        return state, {"loss": jnp.mean(losses), "last_loss": losses[-1]}

    if mesh_ctx is None:
        jitted = jax.jit(fused, donate_argnums=(0,) if config.donate else ())
    else:
        repl = mesh_ctx.replicated
        jitted = jax.jit(fused, in_shardings=(repl, repl, repl),
                         out_shardings=(repl, repl),
                         donate_argnums=(0,) if config.donate else ())

    def call(state, key):
        return jitted(state, sampler.arrays(), key)

    call._jitted = jitted          # AOT/cost-analysis handle (bench.py)
    call._arrays = sampler.arrays
    return call


def build_eval_step(model, config, mesh_ctx: Optional[MeshContext] = None) -> Callable:
    loss_func = LossFunc(config.loss_type, config.task)
    forward = make_forward(model, config, train=False)

    def eval_step(state: TrainState, batch, key):
        out, pbatch = forward(state.model_variables(), batch, key)
        loss = loss_func.calc_loss(out.mu.astype(jnp.float32), out.var,
                                   pbatch["qry_y"], test=True)
        return loss

    if mesh_ctx is None:
        return jax.jit(eval_step)
    repl, data = mesh_ctx.replicated, mesh_ctx.data_sharding
    batch_shardings = dict(ctx_x=data, ctx_y=data, ctx_mask=data,
                           qry_x=data, qry_y=data)
    return jax.jit(eval_step, in_shardings=(repl, batch_shardings, repl),
                   out_shardings=repl)


def init_model(model, config, key):
    """Initialize variables on abstract episode shapes (jitted: eager init
    is hundreds of individual dispatches, each paying a remote per-op
    compile on the axon platform)."""
    h, w, c = config.img_size
    t, s, q = config.tasks_per_batch, config.max_ctx_num, config.query_num
    c_model = c - 1 if config.task == "shapenet_3d" else c
    dtype = _compute_dtype(config)

    @jax.jit
    def init(key):
        ctx_x = jnp.zeros((t, s, h, w, c_model), dtype)
        qry_x = jnp.zeros((t, q, h, w, c_model), dtype)
        ctx_y = jnp.zeros((t, s, config.input_dim), jnp.float32)
        mask = jnp.ones((t, s), bool)
        k_init, k_model = jax.random.split(key)
        return model.init({"params": k_init, **_model_rngs(k_model)},
                          ctx_x, ctx_y, qry_x, ctx_mask=mask, train=False)

    return init(key)
