"""Data-parallel consistency: 8-way sharded step == single-device step."""

import jax
import numpy as np

from tests.test_models_np import episode, make_cfg, shrink_images
from wmfml_tpu.models.registry import build_model
from wmfml_tpu.parallel.mesh import MeshContext
from wmfml_tpu.train.state import TrainState, build_optimizer
from wmfml_tpu.train.steps import build_train_step, init_model


def test_sharded_step_matches_single_device():
    cfg = make_cfg(method="CNPShapeNet1D", task="shapenet_1d", agg_mode="max",
                   aug_list=[], tasks_per_batch=8, donate=False,
                   img_size=(32, 32, 1))
    model = build_model(cfg)
    tx = build_optimizer(cfg)
    key = jax.random.PRNGKey(0)
    variables = init_model(model, cfg, key)
    batch = episode(cfg, label_dim=1)

    # single device
    mesh1 = MeshContext.create(devices=jax.devices()[:1])
    state1 = jax.device_put(TrainState.create(variables, tx),
                            mesh1.replicated)
    step1 = build_train_step(model, cfg, mesh1, tx)
    state1, m1 = step1(state1, mesh1.put_batch(batch), key)

    # 8-way data parallel
    mesh8 = MeshContext.create()
    assert mesh8.num_data_shards == 8
    state8 = jax.device_put(TrainState.create(variables, tx),
                            mesh8.replicated)
    step8 = build_train_step(model, cfg, mesh8, tx)
    state8, m8 = step8(state8, mesh8.put_batch(batch), key)

    assert abs(float(m1["loss"]) - float(m8["loss"])) < 1e-5
    for a, b in zip(jax.tree_util.tree_leaves(state1.params),
                    jax.tree_util.tree_leaves(state8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_meta_models_forward():
    import jax.numpy as jnp

    from wmfml_tpu.models.meta_models import MetaConvModel, MetaMLPModel

    x = jnp.asarray(np.random.RandomState(0).rand(4, 32, 32, 1), jnp.float32)
    conv = MetaConvModel(out_features=2)
    v = conv.init({"params": jax.random.PRNGKey(0)}, x)
    out, kl = conv.apply(v, x)
    assert out.shape == (4, 2) and kl == 0.0
    assert not conv.adaptable_param_filter()(("layer1_bn_scale",))

    mlp = MetaMLPModel(out_features=3)
    v = mlp.init({"params": jax.random.PRNGKey(1)}, x)
    out, kl = mlp.apply(v, x)
    assert out.shape == (4, 3)


def test_device_data_fused_step_dp_consistency():
    """Flagship path: on-device sampling + fused steps, 1 vs 8 devices."""
    import os

    from wmfml_tpu.data.device_sampler import from_dataset
    from wmfml_tpu.data.shapenet_1d import ShapeNet1D
    from wmfml_tpu.data.synthetic import ensure_dataset
    from wmfml_tpu.train.steps import build_device_data_train_step

    root = ensure_dataset(
        "shapenet_1d", os.path.join(os.path.dirname(__file__), "..",
                                    "data_synth"))
    cfg = make_cfg(method="CNPShapeNet1D", task="shapenet_1d", agg_mode="max",
                   aug_list=["task_aug"], tasks_per_batch=8, donate=False,
                   data_size="small", steps_per_call=2)
    data = shrink_images(
        ShapeNet1D(root, cfg.img_size, seed=0, data_size="small",
                   max_ctx=cfg.max_ctx_num, query_num=cfg.query_num), cfg)
    sampler = from_dataset(data, cfg)
    assert sampler is not None
    model = build_model(cfg)
    tx = build_optimizer(cfg)
    key = jax.random.PRNGKey(7)
    variables = init_model(model, cfg, key)

    results = []
    for devs in (jax.devices()[:1], jax.devices()):
        mesh = MeshContext.create(devices=devs)
        state = jax.device_put(TrainState.create(variables, tx),
                               mesh.replicated)
        step = build_device_data_train_step(model, cfg, sampler, mesh, tx, 2)
        state, metrics = step(state, key)
        results.append((float(metrics["loss"]), state.params))

    assert abs(results[0][0] - results[1][0]) < 1e-5
    for a, b in zip(jax.tree_util.tree_leaves(results[0][1]),
                    jax.tree_util.tree_leaves(results[1][1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-6)
