"""Fused multi-step training: K scanned steps == K sequential steps."""

import jax
import numpy as np

from tests.test_models_np import episode, make_cfg, shrink_images
from wmfml_tpu.models.registry import build_model
from wmfml_tpu.train.state import TrainState, build_optimizer
from wmfml_tpu.train.steps import (build_multi_train_step, build_train_step,
                                   init_model)


def test_multi_step_equals_sequential():
    cfg = make_cfg(method="CNPShapeNet1D", task="shapenet_1d", agg_mode="max",
                   aug_list=[], donate=False, img_size=(32, 32, 1))
    model = build_model(cfg)
    tx = build_optimizer(cfg)
    key = jax.random.PRNGKey(0)
    variables = init_model(model, cfg, key)

    k = 3
    # raw labels (1-dim angle) — the train step's device pipeline encodes them
    eps = [episode(cfg, label_dim=1, seed=s) for s in range(k)]
    stacked = {kk: np.stack([e[kk] for e in eps]) for kk in eps[0]}

    # sequential
    single = build_train_step(model, cfg, mesh_ctx=None, tx=tx)
    state_a = TrainState.create(variables, tx)
    call_key = jax.random.PRNGKey(42)
    keys = jax.random.split(call_key, k)
    for i in range(k):
        state_a, _ = single(state_a, eps[i], keys[i])

    # fused
    multi = build_multi_train_step(model, cfg, mesh_ctx=None, tx=tx,
                                   steps_per_call=k)
    state_b = TrainState.create(variables, tx)
    state_b, metrics = multi(state_b, stacked, call_key)

    assert int(state_b.step) == k
    assert np.isfinite(float(metrics["loss"]))
    flat_a = jax.tree_util.tree_leaves(state_a.params)
    flat_b = jax.tree_util.tree_leaves(state_b.params)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5,
                                   atol=2e-6)


def test_trainer_with_steps_per_call(tmp_path):
    import os

    from wmfml_tpu.data.shapenet_1d import ShapeNet1D
    from wmfml_tpu.data.synthetic import ensure_dataset
    from wmfml_tpu.train.trainer import ModelTrainer

    root = ensure_dataset(
        "shapenet_1d", os.path.join(os.path.dirname(__file__), "..",
                                    "data_synth"))
    cfg = make_cfg(method="CNPShapeNet1D", task="shapenet_1d", agg_mode="max",
                   aug_list=["task_aug"], iterations=8, val_freq=4,
                   val_iters=1, steps_per_call=2, data_size="small")
    cfg.results_root = str(tmp_path)
    cfg.save_path = str(tmp_path / "run")
    cfg.create_dirs()
    data = shrink_images(
        ShapeNet1D(root, cfg.img_size, seed=0, data_size="small",
                   max_ctx=cfg.max_ctx_num, query_num=cfg.query_num), cfg)
    trainer = ModelTrainer(build_model(cfg), cfg, data)
    trainer.train()
    assert int(trainer.state.step) == cfg.iterations
    assert trainer.best_loss["validation"] < 50000
