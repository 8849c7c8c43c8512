"""MAML meta-training: vmap(tasks) x lax.scan(inner SGD steps), jitted whole.

Replaces the reference's serial per-task Python loop + torchmeta
(`trainer/maml_trainer.py:114-170`):

  * inner loop — manual SGD on the *adaptable* parameter subset
    (conv/linear weights; batchnorm stats params and BBB encoders stay at
    meta values, exactly what torchmeta's gradient_update_parameters adapts);
    ``first_order`` detaches inner gradients (FOMAML);
  * the inner step is wrapped in jax.checkpoint so second-order backprop
    rematerializes activations instead of storing K copies;
  * outer loss = mean over tasks of query loss + beta * kl
    (`:139-142`); validation reports the pre-kl query loss with the
    test-time step count (`:244-245`) and the test metric (test=True).

Masking: the context set is padded; the inner loss and batchnorm statistics
are mask-aware, so variable train-time shot compiles once.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax
from flax import traverse_util

from wmfml_tpu.aug.pipeline import build_episode_processor
from wmfml_tpu.losses import LossFunc
from wmfml_tpu.train.trainer import ModelTrainer


def partition_params(params, adaptable_fn):
    flat = traverse_util.flatten_dict(params)
    adapt = {k: v for k, v in flat.items() if adaptable_fn(k)}
    frozen = {k: v for k, v in flat.items() if not adaptable_fn(k)}
    return adapt, frozen


def merge_params(adapt, frozen):
    return traverse_util.unflatten_dict({**adapt, **frozen})


def init_step_sizes(config, model, model_params):
    """Learnable inner step sizes (trainer/maml_trainer.py:96-112).

    per_param_step_size: one scalar per adaptable parameter tensor (the
    reference builds an OrderedDict of scalar tensors over
    meta_named_parameters); otherwise a single scalar. Returned as a params
    subtree so the outer optimizer trains it when ``learn_step_size``.
    """
    lr0 = float(config.update_lr)
    if getattr(config, "per_param_step_size", False):
        adapt, _ = partition_params(model_params,
                                    model.adaptable_param_filter())
        return {"/".join(k): jnp.asarray(lr0, jnp.float32) for k in adapt}
    return jnp.asarray(lr0, jnp.float32)


def _apply_inner_update(adapt_p, grads, step_size):
    if isinstance(step_size, dict):
        return {k: adapt_p[k] - step_size["/".join(k)] * grads[k]
                for k in adapt_p}
    return jax.tree_util.tree_map(lambda p, g: p - step_size * g,
                                  adapt_p, grads)


def _remat(fn, mode: str):
    """Rematerialization policy for second-order backprop through the
    inner loop. At these episode sizes activations fit HBM easily, so the
    default is NO remat (measured ~1.9x faster than per-step full remat on
    v5e); "step" restores round-1 behavior, "dots" saves matmul outputs."""
    if mode == "none":
        return fn
    if mode == "dots":
        return jax.checkpoint(
            fn, policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
    return jax.checkpoint(fn)  # "step"


def build_maml_outer(model, config, num_steps: int, train: bool, test: bool):
    """Return outer(params, batch, key) -> (outer_loss, pre_loss).

    ``params`` is the model param tree, or {"net": ..., "step_size": ...}
    when config.learn_step_size is set (the step sizes then ride the outer
    optimizer, reference trainer/maml_trainer.py:104-107).
    """
    loss_func = LossFunc(config.loss_type, config.task)
    compute_dtype = (jnp.bfloat16 if config.compute_dtype == "bfloat16"
                     else jnp.float32)
    process = build_episode_processor(
        config.task, config.aug_list if train else [], train=train,
        compute_dtype=compute_dtype,
        azimuth_only="azimuth_only" in config.aug_list,
        aug_random_order=getattr(config, "aug_random_order", True))
    adaptable_fn = model.adaptable_param_filter()
    update_lr = float(config.update_lr)
    first_order = bool(config.first_order)
    beta = float(config.beta or 0.0)
    learn_ss = bool(getattr(config, "learn_step_size", False))
    per_param_ss = bool(getattr(config, "per_param_step_size", False))
    remat_mode = str(getattr(config, "maml_remat", "none") or "none")
    # train: fully unrolled by default (straight-line second-order graph,
    # measured fastest); eval: scan — test_num_steps is 10-20 and unrolling
    # it only multiplies compile time (no outer grad to schedule around)
    unroll = (int(getattr(config, "maml_unroll", 0) or 0)
              or (max(num_steps, 1) if train else 1))  # scan needs unroll>=1

    def outer(params, batch, key):
        if learn_ss:
            model_params, step_size = params["net"], params["step_size"]
        else:
            model_params = params
            step_size = ({} if per_param_ss else update_lr)
        k_aug, k_model = jax.random.split(key)
        pbatch = process(k_aug, batch)
        adapt0, frozen = partition_params(model_params, adaptable_fn)
        if per_param_ss and not learn_ss:
            step_size = {"/".join(k): update_lr for k in adapt0}
        t = pbatch["ctx_x"].shape[0]
        task_keys = jax.random.split(k_model, t)

        def per_task(ctx_x, ctx_y, qry_x, qry_y, mask, tkey):
            def inner_loss_fn(adapt_p, k):
                p = merge_params(adapt_p, frozen)
                out, _ = model.apply({"params": p}, ctx_x, mask=mask,
                                     rngs={"bbb": k})
                return loss_func.calc_loss(out, None, ctx_y, test=False,
                                           mask=mask)

            @partial(_remat, mode=remat_mode)
            def inner_step(adapt_p, k):
                grads = jax.grad(inner_loss_fn)(adapt_p, k)
                if first_order:
                    grads = jax.lax.stop_gradient(grads)
                return _apply_inner_update(adapt_p, grads, step_size), None

            step_keys = jax.random.split(tkey, num_steps + 1)
            adapted, _ = jax.lax.scan(inner_step, adapt0, step_keys[:-1],
                                      unroll=unroll)
            p = merge_params(adapted, frozen)
            out, kl = model.apply({"params": p}, qry_x, mask=None,
                                  rngs={"bbb": step_keys[-1]})
            # f32 metric like every other calc_loss site (steps.py:84):
            # under bf16 compute the degree metric's arccos/wrap otherwise
            # quantizes at ~1 deg near 2*pi
            qry_loss = loss_func.calc_loss(out.astype(jnp.float32), None,
                                           qry_y, test=test)
            return qry_loss, kl

        losses, kls = jax.vmap(per_task)(
            pbatch["ctx_x"], pbatch["ctx_y"], pbatch["qry_x"],
            pbatch["qry_y"], pbatch["ctx_mask"], task_keys)
        pre_loss = jnp.mean(losses)
        outer_loss = jnp.mean(losses + beta * kls)
        return outer_loss, pre_loss

    return outer


def build_maml_device_train_step(model, config, sampler, mesh_ctx, tx,
                                 steps_per_call: int, outer):
    """K MAML outer steps per dispatch, episodes sampled on device."""

    def one_step(state, inputs):
        batch, key = inputs
        (loss, pre), grads = jax.value_and_grad(
            lambda p: outer(p, batch, key), has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (state.replace(step=state.step + 1, params=params,
                              opt_state=new_opt), (loss, pre))

    def fused(state, arrays, key):
        k_sample, k_fwd = jax.random.split(key)
        batches = jax.vmap(
            lambda k: sampler.sample(k, config.tasks_per_batch, arrays)
        )(jax.random.split(k_sample, steps_per_call))
        if mesh_ctx is not None:
            # same constraint as steps.py build_device_data_train_step:
            # without it GSPMD resolves the sampled batches (and the whole
            # per-task vmap) to fully replicated compute on a multi-chip
            # data mesh
            from jax.sharding import NamedSharding, PartitionSpec as P

            sh = NamedSharding(mesh_ctx.mesh, P(None, "data"))
            batches = jax.lax.with_sharding_constraint(
                batches, {k: sh for k in batches})
        keys = jax.random.split(k_fwd, steps_per_call)
        state, (losses, pres) = jax.lax.scan(one_step, state, (batches, keys))
        # same metric labels AND units as the ANP host path (steps.py:90
        # logs raw out.kl): recover raw kl from the beta-weighted remainder
        inv_beta = 1.0 / float(config.beta) if config.beta else 0.0
        return state, {"loss": jnp.mean(losses), "task_loss": pres[-1],
                       "kl": (losses[-1] - pres[-1]) * inv_beta,
                       "contra": 0.0}

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


class MAMLTrainer(ModelTrainer):
    """Same driver loop as ModelTrainer; MAML steps underneath
    (`trainer/maml_trainer.py:172-268` behavior)."""

    def _init_variables(self, key):
        cfg = self.config
        h, w, c = cfg.img_size
        c = c - 1 if cfg.task == "shapenet_3d" else c

        @jax.jit  # one program instead of per-op eager dispatches
        def init(key):
            x = jnp.zeros((cfg.max_ctx_num, h, w, c), jnp.float32)
            k1, k2 = jax.random.split(key)
            return self.model.init({"params": k1, "bbb": k2}, x, mask=None)

        variables = init(key)
        if getattr(cfg, "learn_step_size", False):
            variables = {"params": {
                "net": variables["params"],
                "step_size": init_step_sizes(cfg, self.model,
                                             variables["params"])}}
        return variables

    def _build_steps(self, tx):
        model, config, mesh = self.model, self.config, self.mesh
        # None-checks, not falsy-or: an explicit num_updates: 0 is a real
        # zero-adaptation ablation, not a request for the default 5
        num_steps = 5 if config.num_steps is None else int(config.num_steps)
        test_steps = (num_steps if config.test_num_steps is None
                      else int(config.test_num_steps))
        train_outer = build_maml_outer(model, config, num_steps,
                                       train=True, test=False)
        eval_outer = build_maml_outer(model, config, test_steps,
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
            self.train_step = build_maml_device_train_step(
                model, config, self.device_sampler, mesh, tx,
                self.steps_per_call, train_outer)
            self.logger.info(
                f"MAML: split resident in HBM, {self.steps_per_call} "
                f"outer step(s) per dispatch")
            self._build_eval(eval_outer, mesh, config)
            return
        self.steps_per_call = 1  # host path: no fusion

        def train_step(state, batch, key):
            (loss, pre), grads = jax.value_and_grad(
                lambda p: train_outer(p, batch, key), has_aux=True)(state.params)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            new_state = state.replace(step=state.step + 1, params=params,
                                      opt_state=new_opt)
            # raw kl, same units as steps.py:90 (see device path above)
            inv_beta = 1.0 / float(config.beta) if config.beta else 0.0
            return new_state, {"loss": loss, "task_loss": pre,
                               "kl": (loss - pre) * inv_beta, "contra": 0.0}

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
            _, pre_loss = eval_outer(state.params, batch, key)
            return pre_loss

        repl, data = mesh.replicated, mesh.data_sharding
        bs = dict(ctx_x=data, ctx_y=data, ctx_mask=data, qry_x=data,
                  qry_y=data)
        self.eval_step = jax.jit(eval_step, in_shardings=(repl, bs, repl),
                                 out_shardings=repl)
        # device-resident validation: with test_num_steps=20 inner steps the
        # host-streamed val sweep costs as much wall clock as the training
        # window it interrupts
        self._eval_pre_fn = (lambda params, batch, key:
                             eval_outer(params, batch, key)[1])
        self._want_device_eval = self.device_sampler is not None

    def _make_device_sweep(self, split):
        return build_outer_device_sweep(self._eval_pre_fn, self.mesh, split)


def build_outer_device_sweep(pre_fn, mesh, split):
    """Device-resident validate sweep over an adaptation-style eval fn:
    gather each batch from the HBM split, run pre_fn(params, batch, key),
    all val_iters batches in one dispatch. Same call signature as
    ModelTrainer's sweeps, so trainer._device_validate just works."""
    repl = mesh.replicated

    def sweep(state, arrays, cls, ctx_idx, qry_idx, keys):
        def one(_, inp):
            c, ci, qi, k = inp
            batch = split.gather(c, ci, qi, arrays=arrays)
            return None, pre_fn(state.params, batch, k)

        _, losses = jax.lax.scan(one, None, (cls, ctx_idx, qry_idx, keys))
        return losses

    jitted = jax.jit(sweep, in_shardings=(repl,) * 6, out_shardings=repl)

    def call(state, cls, ctx_idx, qry_idx, keys):
        return jitted(state, split.arrays(), cls, ctx_idx, qry_idx, keys)

    return call
