"""MR (BBB), FCL, and MAML families: shapes, KL, contrastive views, inner loop."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_models_np import BASE, episode, init_and_apply, make_cfg
from wmfml_tpu.models.registry import build_model


pytestmark = __import__("pytest").mark.slow  # multi-minute CPU smoke

@pytest.mark.parametrize("method,task,agg", [
    ("CNPMRShapeNet1D", "shapenet_1d", "max"),
    ("ANPMRShapeNet1D", "shapenet_1d", "attention"),
    ("CNPMR", "pascal_1d", "max"),
    ("ANPMR", "pascal_1d", "attention"),
])
def test_mr_small_kl_positive(method, task, agg):
    cfg = make_cfg(method=method, task=task, agg_mode=agg)
    model = build_model(cfg)
    b = episode(cfg)
    _, out = init_and_apply(model, b)
    assert out.mu.shape == (cfg.tasks_per_batch, cfg.query_num, cfg.output_dim)
    assert float(out.kl) > 0.0  # BBB KL vs N(0, 0.1) prior


def test_mr_large_kl_positive():
    cfg = make_cfg(method="ANPMRShapeNet3D", task="shapenet_3d",
                   img_agg="reshape", agg_mode="attention")
    model = build_model(cfg)
    b = episode(cfg, channels=3)
    _, out = init_and_apply(model, b)
    assert float(out.kl) > 0.0


def test_bbb_stochastic_at_eval():
    """Reference quirk: BBB samples at eval too (sample=True default)."""
    cfg = make_cfg(method="CNPMRShapeNet1D", task="shapenet_1d", agg_mode="max")
    model = build_model(cfg)
    b = episode(cfg)
    variables, _ = init_and_apply(model, b)
    outs = []
    for s in (10, 11):
        out = model.apply(variables, b["ctx_x"], b["ctx_y"], b["qry_x"],
                          ctx_mask=b["ctx_mask"], train=False,
                          rngs={"bbb": jax.random.PRNGKey(s)})
        outs.append(np.asarray(out.mu))
    assert not np.allclose(outs[0], outs[1])


@pytest.mark.parametrize("method,task,agg,extra", [
    ("FCLCNPShapeNet1D", "shapenet_1d", "max", {}),
    ("FCLCNPDistractor", "distractor", "max", {"img_agg": "max", "dim_w": 16}),
    ("FCLANP", "shapenet_3d", "attention", {"img_agg": "reshape"}),
])
def test_fcl_exposes_contrastive_views(method, task, agg, extra):
    cfg = make_cfg(method=method, task=task, agg_mode=agg,
                   contrastive=True, **extra)
    model = build_model(cfg)
    channels = 3 if task == "shapenet_3d" else 1
    b = episode(cfg, channels=channels)
    _, out = init_and_apply(model, b, train=True)
    ex = out.extras
    if method == "FCLANP":
        assert "qry_rep" in ex
        assert ex["qry_rep"].shape[:2] == (cfg.tasks_per_batch, cfg.query_num)
    else:
        assert ex["z_ctx_view"].shape[0] == cfg.tasks_per_batch
        assert ex["z_qry_view"].shape == ex["z_ctx_view"].shape
    # eval mode: no views
    out_eval = model.apply(
        model.init({"params": jax.random.PRNGKey(0),
                    "bbb": jax.random.PRNGKey(1)},
                   b["ctx_x"], b["ctx_y"], b["qry_x"],
                   ctx_mask=b["ctx_mask"], train=False),
        b["ctx_x"], b["ctx_y"], b["qry_x"], ctx_mask=b["ctx_mask"],
        train=False, rngs={"bbb": jax.random.PRNGKey(2)})
    assert "z_ctx_view" not in out_eval.extras
    assert "qry_rep" not in out_eval.extras


# ---------------------------------------------------------------------------
# MAML
# ---------------------------------------------------------------------------

def maml_cfg(**kw):
    d = dict(BASE, method="MAMLShapeNet1D", task="shapenet_1d",
             dim_w=196, num_filters=16, num_updates=2, test_num_updates=3,
             update_lr=0.002, first_order=False, beta=0.001)
    d.update(kw)
    return make_cfg(**{k: v for k, v in d.items() if k not in BASE or True})


def test_maml_forward_shapes():
    cfg = maml_cfg()
    model = build_model(cfg)
    x = np.random.RandomState(0).rand(5, 128, 128, 1).astype(np.float32)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "bbb": jax.random.PRNGKey(1)}, jnp.asarray(x))
    out, kl = model.apply(variables, jnp.asarray(x),
                          rngs={"bbb": jax.random.PRNGKey(2)})
    assert out.shape == (5, 2)
    assert float(kl) == 0.0
    # tanh head bounds
    assert np.all(np.abs(np.asarray(out)) <= 1.0)


def test_maml_param_partition():
    cfg = maml_cfg(method="MAMLMRShapeNet1D")
    model = build_model(cfg)
    fil = model.adaptable_param_filter()
    assert not fil(("encoder_w", "fc", "W_mu"))      # BBB frozen
    assert fil(("features_1_conv", "kernel"))
    assert not fil(("features_1_bn_scale",))
    assert fil(("regressor", "kernel"))

    cfg2 = maml_cfg()
    fil2 = build_model(cfg2).adaptable_param_filter()
    assert fil2(("encoder_w", "fc", "kernel"))       # plain MAML adapts it


def test_maml_outer_loss_and_adaptation():
    from wmfml_tpu.train.maml import build_maml_outer

    cfg = maml_cfg()
    model = build_model(cfg)
    b = episode(cfg)
    x0 = jnp.zeros((cfg.max_ctx_num, 128, 128, 1))
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "bbb": jax.random.PRNGKey(1)}, x0)
    outer0 = build_maml_outer(model, cfg, num_steps=0, train=False, test=False)
    outer2 = build_maml_outer(model, cfg, num_steps=2, train=False, test=False)
    key = jax.random.PRNGKey(3)
    l0, _ = jax.jit(outer0)(variables["params"], b, key)
    l2, _ = jax.jit(outer2)(variables["params"], b, key)
    assert np.isfinite(float(l0)) and np.isfinite(float(l2))
    # 2 inner steps must change the query loss vs 0 steps
    assert abs(float(l0) - float(l2)) > 1e-8
    # gradient of the outer loss exists and is finite (2nd order path)
    g = jax.grad(lambda p: outer2(p, b, key)[0])(variables["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in leaves)


def test_maml_first_order_flag():
    from wmfml_tpu.train.maml import build_maml_outer

    cfg = maml_cfg(first_order=True)
    model = build_model(cfg)
    b = episode(cfg)
    x0 = jnp.zeros((cfg.max_ctx_num, 128, 128, 1))
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "bbb": jax.random.PRNGKey(1)}, x0)
    outer = build_maml_outer(model, cfg, num_steps=2, train=False, test=False)
    g = jax.grad(lambda p: outer(p, b, jax.random.PRNGKey(3))[0])(
        variables["params"])
    assert all(np.all(np.isfinite(np.asarray(x)))
               for x in jax.tree_util.tree_leaves(g))
