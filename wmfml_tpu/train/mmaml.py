"""MMAML: modulated MAML with a task-embedding network.

Parity with trainer/meta_learner_reg.py + trainer/mmaml_trainer.py:
  * adapt — per task: embeddings from the ConvEmbeddingNet on the context
    set (:132-169), then ``num_updates`` manual SGD steps on ALL GatedConvNet
    params with element-wise gradient clamp +/-20 (:116-130,
    inner_loop_grad_clip=20, train.py:101);
  * step — query loss from adapted params (same embeddings), mean over
    tasks, backprop through both networks; per-network global-norm clip 2.0
    (train.py:103-104) and two Adam(lr) optimizers (networks/
    MMAMLShapeNet1D.py:83-84) — realized here as optax.multi_transform over
    the {model, embedding} subtrees;
  * second-order by default (first_order=False, train.py:99).

TPU design: vmap over tasks x lax.scan over inner steps, whole step jitted;
the serial Python loops of the reference collapse into one SPMD program.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from wmfml_tpu.aug.pipeline import build_episode_processor
from wmfml_tpu.losses import LossFunc
from wmfml_tpu.train.maml import _remat
from wmfml_tpu.train.trainer import ModelTrainer

INNER_GRAD_CLIP = 20.0
OUTER_GRAD_NORM_CLIP = 2.0


class MMAMLBundle(NamedTuple):
    """The pair of networks a MMAML method bundles
    (networks/MMAMLShapeNet1D.py:52-84)."""

    gated: object      # GatedConvNet
    embed: object      # ConvEmbeddingNet


def build_mmaml_outer(bundle: MMAMLBundle, config, num_steps: int,
                      train: bool, test: bool):
    loss_func = LossFunc(config.loss_type, config.task)
    compute_dtype = (jnp.bfloat16 if config.compute_dtype == "bfloat16"
                     else jnp.float32)
    process = build_episode_processor(
        config.task, config.aug_list if train else [], train=train,
        compute_dtype=compute_dtype,
        azimuth_only="azimuth_only" in config.aug_list,
        aug_random_order=getattr(config, "aug_random_order", True))
    fast_lr = float(config.update_lr)
    first_order = bool(config.first_order)
    remat_mode = str(getattr(config, "maml_remat", "none") or "none")
    # see build_maml_outer: unroll for train, scan for eval
    unroll = (int(getattr(config, "maml_unroll", 0) or 0)
              or (max(num_steps, 1) if train else 1))  # scan needs unroll>=1

    def outer(params, batch, key):
        pbatch = process(key, batch)

        def per_task(ctx_x, ctx_y, qry_x, qry_y, mask):
            embeddings = bundle.embed.apply(
                {"params": params["embedding"]}, ctx_x, mask=mask)

            def inner_loss_fn(mp):
                preds = bundle.gated.apply({"params": mp}, ctx_x,
                                           embeddings=embeddings, mask=mask)
                return loss_func.calc_loss(preds, None, ctx_y, test=False,
                                           mask=mask)

            @partial(_remat, mode=remat_mode)
            def inner_step(mp, _):
                grads = jax.grad(inner_loss_fn)(mp)
                grads = jax.tree_util.tree_map(
                    lambda g: jnp.clip(g, -INNER_GRAD_CLIP, INNER_GRAD_CLIP),
                    grads)
                if first_order:
                    grads = jax.lax.stop_gradient(grads)
                return jax.tree_util.tree_map(
                    lambda p, g: p - fast_lr * g, mp, grads), None

            adapted, _ = jax.lax.scan(inner_step, params["model"], None,
                                      length=num_steps, unroll=unroll)
            preds = bundle.gated.apply({"params": adapted}, qry_x,
                                       embeddings=embeddings, mask=None)
            # f32 metric like every other calc_loss site (steps.py:84)
            return loss_func.calc_loss(preds.astype(jnp.float32), None,
                                       qry_y, test=test)

        losses = jax.vmap(per_task)(
            pbatch["ctx_x"], pbatch["ctx_y"], pbatch["qry_x"],
            pbatch["qry_y"], pbatch["ctx_mask"])
        return jnp.mean(losses)

    return outer


def build_mmaml_optimizer(config):
    """Two Adams with per-network global-norm clipping, as one transform.

    flatten is gated on the flag ALONE here (no model-axis guard, unlike
    build_optimizer): MMAML state is always jitted fully replicated — its
    steps never take state_shardings — so a flattened opt_state can't
    conflict with TP placements, and tying the layout to mesh_shape would
    gratuitously break opt_state restore across mesh changes.
    """
    adam = optax.adam(config.lr)
    if getattr(config, "flatten_opt", True):
        adam = optax.flatten(adam)  # one fused vector update per network
    per_net = optax.chain(optax.clip_by_global_norm(OUTER_GRAD_NORM_CLIP),
                          adam)
    return optax.multi_transform(
        {"model": per_net, "embedding": per_net},
        param_labels={"model": "model", "embedding": "embedding"})


def build_mmaml_device_train_step(bundle, config, sampler, mesh_ctx, tx,
                                  steps_per_call: int, outer):
    """K MMAML outer steps per dispatch, episodes sampled on device."""

    def one_step(state, inputs):
        batch, key = inputs
        loss, grads = jax.value_and_grad(
            lambda p: outer(p, batch, key))(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (state.replace(step=state.step + 1, params=params,
                              opt_state=new_opt), loss)

    def fused(state, arrays, key):
        k_sample, k_fwd = jax.random.split(key)
        batches = jax.vmap(
            lambda k: sampler.sample(k, config.tasks_per_batch, arrays)
        )(jax.random.split(k_sample, steps_per_call))
        if mesh_ctx is not None:
            # force task-axis sharding over "data" (see steps.py and
            # maml.py: without the constraint GSPMD replicates the compute)
            from jax.sharding import NamedSharding, PartitionSpec as P

            sh = NamedSharding(mesh_ctx.mesh, P(None, "data"))
            batches = jax.lax.with_sharding_constraint(
                batches, {k: sh for k in batches})
        keys = jax.random.split(k_fwd, steps_per_call)
        state, losses = jax.lax.scan(one_step, state, (batches, keys))
        return state, {"loss": jnp.mean(losses), "task_loss": losses[-1],
                       "kl": 0.0, "contra": 0.0}

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


class MMAMLTrainer(ModelTrainer):
    def __init__(self, model: MMAMLBundle, config, data, **kw):
        self.bundle = model
        super().__init__(model, config, data, **kw)
        # evaluator/MMAML best-loss thresholds (trainer/mmaml_trainer.py:38)
        self.best_loss = {"validation": 10000.0, "test": 10000.0}

    def _init_variables(self, key):
        cfg = self.config
        h, w, c = cfg.img_size
        c = c - 1 if cfg.task == "shapenet_3d" else c

        # jit: eager init is ~100 individual dispatches, each paying a
        # remote per-op compile on this platform (minutes of wall clock)
        @jax.jit
        def init(key):
            x = jnp.zeros((cfg.max_ctx_num, h, w, c), jnp.float32)
            k1, k2 = jax.random.split(key)
            embed_vars = self.bundle.embed.init({"params": k2}, x, mask=None)
            embeddings = self.bundle.embed.apply(embed_vars, x, mask=None)
            gated_vars = self.bundle.gated.init(
                {"params": k1}, x, embeddings=embeddings, mask=None)
            return {"params": {"model": gated_vars["params"],
                               "embedding": embed_vars["params"]}}

        return init(key)

    def _build_optimizer(self):
        # the base TrainState is created directly with the multi_transform
        # pair — no throwaway Adam state / second jitted tx.init
        return build_mmaml_optimizer(self.config)

    def _build_steps(self, tx):
        config, mesh = self.config, self.mesh
        # None-checks, not falsy-or: num_updates: 0 is a real ablation
        num_steps = 5 if config.num_steps is None else int(config.num_steps)
        test_steps = (num_steps if config.test_num_steps is None
                      else int(config.test_num_steps))
        train_outer = build_mmaml_outer(self.bundle, config, num_steps,
                                        train=True, test=False)
        eval_outer = build_mmaml_outer(self.bundle, config, test_steps,
                                       train=False, test=True)

        if config.device_data in ("auto", True, "true"):
            from wmfml_tpu.data.device_sampler import from_dataset

            self.device_sampler = from_dataset(self.data, config)
            if (self.device_sampler is None
                    and config.device_data != "auto"):
                self.logger.info("device_data requested but split layout/"
                                 "size unsupported; falling back to host "
                                 "streaming")
        if self.device_sampler is not None:
            self.train_step = build_mmaml_device_train_step(
                self.bundle, config, self.device_sampler, mesh, tx,
                self.steps_per_call, train_outer)
            self.logger.info(
                f"MMAML: split resident in HBM, {self.steps_per_call} "
                f"outer step(s) per dispatch")
            self._build_eval(eval_outer, mesh, config)
            return
        self.steps_per_call = 1  # host path: no fusion

        def train_step(state, batch, key):
            loss, grads = jax.value_and_grad(
                lambda p: train_outer(p, batch, key))(state.params)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return (state.replace(step=state.step + 1, params=params,
                                  opt_state=new_opt),
                    {"loss": loss, "task_loss": loss, "kl": 0.0,
                     "contra": 0.0})

        repl, data = mesh.replicated, mesh.data_sharding
        bs = dict(ctx_x=data, ctx_y=data, ctx_mask=data, qry_x=data,
                  qry_y=data)
        self.train_step = jax.jit(
            train_step, in_shardings=(repl, bs, repl),
            out_shardings=(repl, repl),
            donate_argnums=(0,) if config.donate else ())
        self._build_eval(eval_outer, mesh, config)

    def _build_eval(self, eval_outer, mesh, config):
        def eval_step(state, batch, key):
            return eval_outer(state.params, batch, key)

        repl, data = mesh.replicated, mesh.data_sharding
        bs = dict(ctx_x=data, ctx_y=data, ctx_mask=data, qry_x=data,
                  qry_y=data)
        self.eval_step = jax.jit(eval_step, in_shardings=(repl, bs, repl),
                                 out_shardings=repl)
        self._eval_pre_fn = eval_outer
        self._want_device_eval = self.device_sampler is not None

    def _make_device_sweep(self, split):
        from wmfml_tpu.train.maml import build_outer_device_sweep

        return build_outer_device_sweep(self._eval_pre_fn, self.mesh, split)
