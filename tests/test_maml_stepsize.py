"""Learnable / per-param MAML inner step sizes
(reference trainer/maml_trainer.py:96-112)."""

import jax
import jax.numpy as jnp
import numpy as np

from tests.test_models_np import make_cfg
from wmfml_tpu.models.registry import build_model
from wmfml_tpu.train.maml import (build_maml_outer, init_step_sizes,
                                  partition_params)


pytestmark = __import__("pytest").mark.slow  # multi-minute CPU smoke

def _episode(cfg, seed=0):
    rng = np.random.RandomState(seed)
    h, w, c = cfg.img_size
    t, s, q = cfg.tasks_per_batch, cfg.max_ctx_num, cfg.query_num
    return dict(
        ctx_x=rng.rand(t, s, h, w, c).astype(np.float32),
        ctx_y=rng.rand(t, s, 1).astype(np.float32),
        ctx_mask=np.ones((t, s), bool),
        qry_x=rng.rand(t, q, h, w, c).astype(np.float32),
        qry_y=rng.rand(t, q, 1).astype(np.float32),
    )


def _maml_cfg(**kw):
    return make_cfg(method="MAMLShapeNet1D", task="shapenet_1d",
                    agg_mode=None, dim_w=36, num_filters=8, num_updates=2,
                    test_num_updates=2, first_order=False, update_lr=0.01,
                    beta=0.0, tasks_per_batch=2, max_ctx_num=3, query_num=2,
                    **kw)


def _init(model, cfg, key):
    h, w, c = cfg.img_size
    x = jnp.zeros((cfg.max_ctx_num, h, w, c), jnp.float32)
    k1, k2 = jax.random.split(key)
    return model.init({"params": k1, "bbb": k2}, x, mask=None)["params"]


def test_learned_scalar_step_size_gets_gradients():
    cfg = _maml_cfg(learn_step_size=True)
    model = build_model(cfg)
    net = _init(model, cfg, jax.random.PRNGKey(0))
    params = {"net": net, "step_size": init_step_sizes(cfg, model, net)}
    assert params["step_size"].shape == ()
    outer = build_maml_outer(model, cfg, 2, train=True, test=False)
    grads = jax.grad(lambda p: outer(p, _episode(cfg),
                                     jax.random.PRNGKey(1))[0])(params)
    assert float(jnp.abs(grads["step_size"])) > 0.0


def test_per_param_step_sizes_get_gradients():
    cfg = _maml_cfg(learn_step_size=True, per_param_step_size=True)
    model = build_model(cfg)
    net = _init(model, cfg, jax.random.PRNGKey(0))
    ss = init_step_sizes(cfg, model, net)
    adapt, _ = partition_params(net, model.adaptable_param_filter())
    assert set(ss) == {"/".join(k) for k in adapt}  # one scalar per tensor
    assert all(np.isclose(float(v), cfg.update_lr) for v in ss.values())
    params = {"net": net, "step_size": ss}
    outer = build_maml_outer(model, cfg, 2, train=True, test=False)
    grads = jax.grad(lambda p: outer(p, _episode(cfg),
                                     jax.random.PRNGKey(1))[0])(params)
    nonzero = [k for k, v in grads["step_size"].items()
               if float(jnp.abs(v)) > 0]
    assert len(nonzero) == len(ss), f"no grad for {set(ss) - set(nonzero)}"


def test_fixed_step_size_unchanged_by_default():
    """Default path (no learnable step sizes): params tree is the raw model
    tree and outer loss matches the explicit scalar-step formulation."""
    cfg = _maml_cfg()
    model = build_model(cfg)
    net = _init(model, cfg, jax.random.PRNGKey(0))
    outer = build_maml_outer(model, cfg, 2, train=True, test=False)
    loss_default, _ = outer(net, _episode(cfg), jax.random.PRNGKey(1))

    cfg2 = _maml_cfg(learn_step_size=True)
    outer2 = build_maml_outer(model, cfg2, 2, train=True, test=False)
    params = {"net": net, "step_size": init_step_sizes(cfg2, model, net)}
    loss_learn, _ = outer2(params, _episode(cfg), jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(loss_default), float(loss_learn),
                               rtol=1e-6)


def test_zero_inner_steps_is_a_real_ablation():
    """num_updates: 0 must run zero adaptation steps (falsy-or coercion
    used to silently substitute the default 5 — round-3 review fix): the
    outer loss then equals the unadapted forward's query loss, and the
    outer grad still flows."""
    cfg = make_cfg(method="MAMLShapeNet1D", task="shapenet_1d",
                   agg_mode=None, dim_w=36, num_filters=8, num_updates=0,
                   test_num_updates=0, first_order=False, update_lr=0.01,
                   beta=0.0, tasks_per_batch=2, max_ctx_num=3, query_num=2)
    model = build_model(cfg)
    params = _init(model, cfg, jax.random.PRNGKey(0))
    batch = _episode(cfg)
    key = jax.random.PRNGKey(3)

    outer0 = build_maml_outer(model, cfg, 0, train=True, test=False)
    loss0, _ = outer0(params, batch, key)

    # reference point: forward with the UNADAPTED params on the query set
    outer2 = build_maml_outer(model, cfg, 2, train=True, test=False)
    loss2, _ = outer2(params, batch, key)
    assert not np.allclose(float(loss0), float(loss2)), \
        "0 and 2 inner steps gave identical losses — adaptation is dead"

    grads, _ = jax.grad(lambda p: outer0(p, batch, key), has_aux=True)(params)
    gnorm = sum(float(jnp.sum(jnp.abs(g)))
                for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(float(loss0)) and gnorm > 0.0
