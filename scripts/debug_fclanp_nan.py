#!/usr/bin/env python
"""Locate the FCLANP (contrastive ANP, ShapeNet3D) NaN divergence.

Two 20k-iter FCLANP runs aborted with a non-finite loss at the first guard
check (iteration 1000, val_freq cadence); onset is somewhere in (0, 1000].
This reproduces the exact run (same seed/key derivation/8-step dispatch) but
returns PER-STEP component metrics from inside the scan: task_loss, contra,
kl, global grad-norm, global param-norm, and the min query-rep L2 norm (the
z/||z|| normalization in nt_xent is the prime suspect if reps collapse).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/debug_fclanp_nan.py
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import optax

from wmfml_tpu.cli.common import apply_prng_impl, seed_everything
from wmfml_tpu.configs import Config
from wmfml_tpu.data.factory import build_data
from wmfml_tpu.losses import LossFunc
from wmfml_tpu.models.registry import build_model
from wmfml_tpu.train.state import TrainState, build_optimizer
from wmfml_tpu.train.steps import _contra_term, init_model, make_forward


def main():
    config = Config("cfg/train/contrastive/FCLANP_DA+TA_ShapeNet3D.yaml",
                    overrides=["iterations=1200", "val_freq=1000",
                               "val_iters=10", "save_path_root=/tmp/fcl_dbg"])
    seed_everything(config.seed)
    apply_prng_impl(config)
    data = build_data(config, mode="train")
    model = build_model(config)

    if config.task == "shapenet_3d" and config.gen_bg:
        data.gen_bg(config)

    from wmfml_tpu.data.device_sampler import from_dataset
    sampler = from_dataset(data, config)
    assert sampler is not None

    tx = build_optimizer(config)
    key = jax.random.PRNGKey(config.seed)
    variables = init_model(model, config, key)
    state = TrainState.create(variables, tx)

    loss_func = LossFunc(config.loss_type, config.task)
    forward = make_forward(model, config, train=True)
    beta = float(config.beta or 0.0)
    rate = float(config.contrastive_rate or 0.0)
    K = 8  # steps_per_call of the failed runs

    def one_step(state, inputs):
        batch, k_fwd = inputs

        def loss_fn(params):
            variables = {"params": params, **state.extra_vars}
            out, pbatch = forward(variables, batch, k_fwd)
            task_loss = loss_func.calc_loss(
                out.mu.astype(jnp.float32), out.var, pbatch["qry_y"],
                test=False)
            contra = _contra_term(config, out, pbatch)
            total = task_loss + beta * out.kl + rate * contra
            qry_rep = out.extras.get("qry_rep")
            min_rep = (jnp.min(jnp.linalg.norm(
                qry_rep.astype(jnp.float32), axis=-1))
                if qry_rep is not None else jnp.float32(0))
            return total, (task_loss, contra, out.kl, min_rep)

        (loss, aux), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        gnorm = optax.global_norm(grads)
        pnorm = optax.global_norm(state.params)

        # per-term gradient norms to isolate which term NaNs
        def term_loss(params, which):
            variables = {"params": params, **state.extra_vars}
            out, pbatch = forward(variables, batch, k_fwd)
            if which == "task":
                return loss_func.calc_loss(
                    out.mu.astype(jnp.float32), out.var, pbatch["qry_y"],
                    test=False)
            return rate * _contra_term(config, out, pbatch)

        g_task = optax.global_norm(jax.grad(term_loss)(state.params, "task"))
        g_con = optax.global_norm(jax.grad(term_loss)(state.params, "contra"))

        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        task_loss, contra, kl, min_rep = aux
        metrics = jnp.stack([loss, task_loss, contra,
                             jnp.float32(kl), gnorm, pnorm, min_rep,
                             g_task, g_con])
        return state.replace(step=state.step + 1, params=new_params,
                             opt_state=new_opt), metrics

    def fused(state, arrays, key):
        k_sample, k_fwd = jax.random.split(key)
        batches = jax.vmap(
            lambda k: sampler.sample(k, config.tasks_per_batch, arrays)
        )(jax.random.split(k_sample, K))
        keys = jax.random.split(k_fwd, K)
        state, ms = jax.lax.scan(one_step, state, (batches, keys))
        return state, ms  # [K, 9]

    jitted = jax.jit(fused)
    base_key = jax.random.PRNGKey(config.seed)

    names = ["loss", "task", "contra", "kl", "gnorm", "pnorm", "min_rep",
             "g_task", "g_con"]
    for it in range(0, 1200, K):
        state, ms = jitted(state, sampler.arrays(), jax.random.fold_in(
            base_key, it))
        ms = np.asarray(jax.device_get(ms))
        bad = ~np.isfinite(ms).all(axis=1)
        row = {"it": it, **{n: round(float(ms[-1, i]), 4)
                            for i, n in enumerate(names)}}
        if it % 200 < K or bad.any():
            print(json.dumps(row), flush=True)
        if bad.any():
            first = int(np.argmax(bad))
            print("FIRST NON-FINITE at iteration", it + first)
            for s in range(max(0, first - 2), min(K, first + 2)):
                print("  step", it + s,
                      {n: float(ms[s, i]) for i, n in enumerate(names)})
            break
    else:
        print("no non-finite loss in 1200 iterations (?)")


if __name__ == "__main__":
    main()
