"""Phase-layout (space-to-depth) ResNet trunk stem == stock conv1+layer1,
values and gradients, on the SAME parameters (nn/encoders.py:_s2d_trunk_stem)."""

import jax
import jax.numpy as jnp
import numpy as np

from wmfml_tpu.nn.encoders import ResNetTrunk


def _grads(mod, v, x):
    def loss(params):
        return jnp.sum(mod.apply({"params": params}, x) ** 2)
    return jax.grad(loss)(v["params"])


def test_s2d_trunk_matches_stock_values_and_grads():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(3, 64, 64, 4), jnp.float32)
    stock = ResNetTrunk(img_agg="reshape", trunk_stem="conv")
    s2d = ResNetTrunk(img_agg="reshape", trunk_stem="s2d")
    v = stock.init(jax.random.PRNGKey(0), x)
    # identical param pytrees (names + shapes) => the SAME variables load
    v2 = s2d.init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(v) ==
            jax.tree_util.tree_structure(v2))
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(v),
            jax.tree_util.tree_leaves_with_path(v2)):
        assert a.shape == b.shape, (pa, a.shape, b.shape)
        # same param paths => same flax init RNG folding => same values
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    y_stock = stock.apply(v, x)
    y_s2d = s2d.apply(v, x)
    np.testing.assert_allclose(np.asarray(y_s2d), np.asarray(y_stock),
                               rtol=2e-5, atol=2e-5)

    ga = jax.tree_util.tree_leaves(_grads(stock, v, x))
    gb = jax.tree_util.tree_leaves(_grads(s2d, v, x))
    for a, b in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-4)


def test_s2d_trunk_all_agg_modes_match():
    rng = np.random.RandomState(1)
    # 64x64 floor: the "max" agg pools the final 2x2 grid adaptively
    x = jnp.asarray(rng.rand(2, 64, 64, 3), jnp.float32)
    for img_agg in ("mean", "max", "reshape"):
        stock = ResNetTrunk(img_agg=img_agg, trunk_stem="conv")
        s2d = ResNetTrunk(img_agg=img_agg, trunk_stem="s2d")
        v = stock.init(jax.random.PRNGKey(7), x)
        np.testing.assert_allclose(
            np.asarray(s2d.apply(v, x)), np.asarray(stock.apply(v, x)),
            rtol=2e-5, atol=2e-5, err_msg=img_agg)


def test_trunk_stem_plumbs_and_model_outputs_match():
    # registry plumb (the round-4 pool_impl silent-no-op failure mode) +
    # full-model forward equality on the same params
    from wmfml_tpu.configs import Config
    from wmfml_tpu.models.registry import build_model

    base = dict(task="shapenet_3d", checkpoint="", loss_type="mse",
                tasks_per_batch=2, max_ctx_num=3, noise_scale=0.0, lr=1e-4,
                weight_decay=False, optimizer="Adam", bg_gen_freq=100,
                val_iters=1, val_freq=10, iterations=5, device="cpu", seed=0,
                aug_list=[], query_num=2, img_agg="reshape",
                agg_mode="attention")
    models = {}
    for stem in ("conv", "s2d"):
        cfg = Config.from_dict(dict(base, method="ANP", trunk_stem=stem),
                               make_dirs=False)
        models[stem] = build_model(cfg)
        assert models[stem].trunk_stem == stem
    for m in ("SingleTaskShapeNet3D",):
        cfg = Config.from_dict(dict(base, method=m, agg_mode="max",
                                    trunk_stem="s2d"), make_dirs=False)
        assert build_model(cfg).trunk_stem == "s2d", m

    rng = np.random.RandomState(3)
    ctx_x = jnp.asarray(rng.rand(2, 3, 64, 64, 4), jnp.float32)
    ctx_y = jnp.asarray(rng.rand(2, 3, 4), jnp.float32)
    qry_x = jnp.asarray(rng.rand(2, 2, 64, 64, 4), jnp.float32)
    v = models["conv"].init(jax.random.PRNGKey(0), ctx_x, ctx_y, qry_x)
    assert (jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(
        models["s2d"].init(jax.random.PRNGKey(0), ctx_x, ctx_y, qry_x)))
    out_conv = models["conv"].apply(v, ctx_x, ctx_y, qry_x)
    out_s2d = models["s2d"].apply(v, ctx_x, ctx_y, qry_x)
    np.testing.assert_allclose(np.asarray(out_s2d.mu),
                               np.asarray(out_conv.mu),
                               rtol=5e-5, atol=5e-5)


def test_s2d_trunk_odd_dims_fall_back():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(2, 30, 30, 3), jnp.float32)
    s2d = ResNetTrunk(img_agg="mean", trunk_stem="s2d")
    v = s2d.init(jax.random.PRNGKey(0), x)
    out = s2d.apply(v, x)
    assert out.shape == (2, 64)
