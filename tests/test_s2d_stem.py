"""Phase-layout (space-to-depth) stem == stock conv stack, values and
gradients, on the SAME parameters (nn/encoders.py:_s2d_stem)."""

import jax
import jax.numpy as jnp
import numpy as np

from wmfml_tpu.nn.encoders import LiteratureEncoder


def _grads(mod, v, x):
    def loss(params):
        return jnp.sum(mod.apply({"params": params}, x) ** 2)
    return jax.grad(loss)(v["params"])


def test_s2d_stem_matches_stock_values_and_grads():
    # "s2dp" additionally folds the max pool into the phase layout; its
    # tie-routing on exact float ties differs from select-and-scatter, but
    # post-relu zero-ties carry no gradient (relu'(0) = 0) and non-zero
    # float ties have measure zero — the tolerances below hold for both.
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(4, 32, 32, 1), jnp.float32)
    stock = LiteratureEncoder(dim_w=16, stem_impl="conv")
    v = stock.init(jax.random.PRNGKey(0), x)
    y_stock = stock.apply(v, x)
    ga = jax.tree_util.tree_leaves(_grads(stock, v, x))

    for impl in ("s2d", "s2dp"):
        s2d = LiteratureEncoder(dim_w=16, stem_impl=impl)
        # identical param pytrees (names + shapes) => the SAME variables load
        v2 = s2d.init(jax.random.PRNGKey(0), x)
        assert (jax.tree_util.tree_structure(v) ==
                jax.tree_util.tree_structure(v2)), impl

        y_s2d = s2d.apply(v, x)
        np.testing.assert_allclose(np.asarray(y_s2d), np.asarray(y_stock),
                                   rtol=2e-5, atol=2e-5, err_msg=impl)

        gb = jax.tree_util.tree_leaves(_grads(s2d, v, x))
        for a, b in zip(ga, gb):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=2e-4, atol=2e-4, err_msg=impl)


def test_s2d_stem_second_order_matches():
    # MAML differentiates THROUGH the inner gradient: grad-of-grad must
    # also agree between the two lowerings on the same params.
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(2, 16, 16, 1), jnp.float32)
    stock = LiteratureEncoder(dim_w=8, stem_impl="conv")
    v = stock.init(jax.random.PRNGKey(0), x)

    def second_order(mod):
        def inner(params):
            g = jax.grad(
                lambda p: jnp.sum(mod.apply({"params": p}, x) ** 2))(params)
            return sum(jnp.sum(leaf ** 2)
                       for leaf in jax.tree_util.tree_leaves(g))
        return jax.grad(inner)(v["params"])

    ga = jax.tree_util.tree_leaves(second_order(stock))
    for impl in ("s2d", "s2dp"):
        s2d = LiteratureEncoder(dim_w=8, stem_impl=impl)
        gb = jax.tree_util.tree_leaves(second_order(s2d))
        for a, b in zip(ga, gb):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=5e-3, atol=1e-4, err_msg=impl)


def test_stem_impl_plumbs_through_registry():
    # guard the advisor-flagged failure mode (round-4 pool_impl): a config
    # knob that only reaches ONE model family silently no-ops elsewhere
    from wmfml_tpu.configs import Config
    from wmfml_tpu.models.registry import build_model

    base = dict(checkpoint="", loss_type="mse", tasks_per_batch=2,
                max_ctx_num=5, noise_scale=0.0, lr=1e-4, weight_decay=False,
                optimizer="Adam", bg_gen_freq=100, val_iters=1, val_freq=10,
                iterations=5, device="cpu", seed=0, aug_list=[], query_num=4,
                dim_w=64, n_hidden_units_r=[100, 100], dim_r=64, dim_z=64,
                stem_impl="s2d")
    cases = [
        ("ANPShapeNet1D", dict(agg_mode="attention")),
        ("MAMLShapeNet1D", dict(agg_mode=None, num_filters=32,
                                num_updates=1, test_num_updates=1,
                                first_order=True, update_lr=0.01, beta=0.0)),
        ("SingleTaskShapeNet1D", dict(agg_mode="max")),
    ]
    for method, extra in cases:
        cfg = Config.from_dict(dict(base, method=method, task="shapenet_1d",
                                    **extra), make_dirs=False)
        model = build_model(cfg)
        assert getattr(model, "stem_impl", None) == "s2d", method


def test_s2d_stem_odd_dims_fall_back():
    # H % 4 != 0: the s2d gate must fall back to the stock stack
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(2, 30, 30, 1), jnp.float32)
    s2d = LiteratureEncoder(dim_w=8, stem_impl="s2d")
    v = s2d.init(jax.random.PRNGKey(0), x)
    out = s2d.apply(v, x)
    assert out.shape == (2, 8)
