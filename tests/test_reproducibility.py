"""Seed reproducibility: two identical runs produce identical loss streams.

The reference's quality-control strategy is determinism-by-seeding (SURVEY
§4); here the whole data+aug+train path is keyed by config.seed, so equal
seeds must reproduce bitwise and different seeds must diverge."""

import os

import numpy as np
import pytest

from tests.test_models_np import make_cfg
from wmfml_tpu.data.shapenet_1d import ShapeNet1D
from wmfml_tpu.data.synthetic import ensure_dataset
from wmfml_tpu.models.registry import build_model
from wmfml_tpu.train.trainer import ModelTrainer

pytestmark = pytest.mark.slow  # multi-minute CPU smoke

DATA_ROOT = os.path.join(os.path.dirname(__file__), "..", "data_synth")


def _run(tmp_path, tag, seed):
    cfg = make_cfg(method="CNPShapeNet1D", task="shapenet_1d", agg_mode="max",
                   aug_list=["task_aug"], iterations=6, val_freq=100,
                   val_iters=1, data_size="small", tasks_per_batch=2,
                   max_ctx_num=5, query_num=4, steps_per_call=2, seed=seed,
                   donate=False)
    cfg.results_root = str(tmp_path)
    cfg.save_path = str(tmp_path / tag)
    cfg.create_dirs()
    root = ensure_dataset("shapenet_1d", DATA_ROOT)
    data = ShapeNet1D(root, cfg.img_size, seed=seed, data_size="small",
                      max_ctx=cfg.max_ctx_num, query_num=cfg.query_num)
    trainer = ModelTrainer(build_model(cfg), cfg, data)
    trainer.train()
    import jax

    loss = float(trainer.validate(99, "validation"))
    leaf = np.asarray(jax.device_get(
        trainer.state.params)["encoder_w0"]["conv0"]["kernel"])
    return loss, leaf


def test_same_seed_reproduces_bitwise(tmp_path):
    l1, w1 = _run(tmp_path, "a", seed=7)
    l2, w2 = _run(tmp_path, "b", seed=7)
    assert l1 == l2
    np.testing.assert_array_equal(w1, w2)


def test_different_seed_diverges(tmp_path):
    l1, w1 = _run(tmp_path, "c", seed=7)
    l3, w3 = _run(tmp_path, "d", seed=8)
    assert not np.array_equal(w1, w3)
