"""End-to-end: synthetic ShapeNet1D -> CNP training loop -> eval artifacts."""

import os

import numpy as np
import pytest

from wmfml_tpu.configs import Config
from wmfml_tpu.data.shapenet_1d import ShapeNet1D
from wmfml_tpu.data.synthetic import ensure_dataset
from wmfml_tpu.models.registry import build_model
from wmfml_tpu.train.trainer import ModelTrainer

pytestmark = __import__("pytest").mark.slow  # multi-minute CPU smoke

DATA_ROOT = os.path.join(os.path.dirname(__file__), "..", "data_synth")


@pytest.fixture(scope="session")
def shapenet1d_path():
    return ensure_dataset("shapenet_1d", DATA_ROOT)


def make_cfg(tmp_path, **kw):
    d = dict(
        method="CNPShapeNet1D", task="shapenet_1d", aug_list=["task_aug"],
        checkpoint="", agg_mode="max", loss_type="mse", tasks_per_batch=2,
        max_ctx_num=5, query_num=4, data_size="small", dim_w=64,
        n_hidden_units_r=[100, 100], dim_r=64, dim_z=64, noise_scale=0.0,
        lr=1e-3, weight_decay=False, optimizer="Adam", bg_gen_freq=100,
        val_iters=1, val_freq=4, iterations=8, device="cpu", seed=3,
    )
    d.update(kw)
    return Config.from_dict(d, make_dirs=True, results_root=str(tmp_path))


def test_sampler_shapes(shapenet1d_path):
    data = ShapeNet1D(shapenet1d_path, [128, 128, 1], seed=0,
                      data_size="small", max_ctx=5, query_num=4)
    b = data.get_batch("train", 3, 5)
    assert b["ctx_x"].shape == (3, 5, 128, 128, 1)
    assert b["ctx_x"].dtype == np.uint8
    assert b["qry_x"].shape == (3, 4, 128, 128, 1)
    assert b["ctx_y"].shape == (3, 5, 1)
    assert b["ctx_mask"].shape == (3, 5)
    # train shot is uniform in [3, max]; mask prefix true
    n = b["ctx_mask"][0].sum()
    assert 3 <= n <= 5
    assert np.all(b["ctx_mask"].sum(1) == n)
    # labels in [0, 2pi)
    assert 0 <= b["qry_y"].min() and b["qry_y"].max() < 2 * np.pi + 1e-6

    e = data.get_batch("test", 2, 3)
    assert e["ctx_mask"].sum(1).tolist() == [3, 3]
    assert e["ctx_x"].shape[1] == 5  # padded to max_ctx


def test_eval_stream_deterministic(shapenet1d_path):
    data = ShapeNet1D(shapenet1d_path, [128, 128, 1], seed=0,
                      data_size="small", max_ctx=5, query_num=4)
    data.reset_eval("test", 42)
    b1 = data.get_batch("test", 2, 3)
    data.reset_eval("test", 42)
    b2 = data.get_batch("test", 2, 3)
    np.testing.assert_array_equal(b1["qry_y"], b2["qry_y"])
    np.testing.assert_array_equal(b1["ctx_x"], b2["ctx_x"])


def test_train_loop_e2e(tmp_path, shapenet1d_path):
    cfg = make_cfg(tmp_path, aug_list=["task_aug", "data_aug"])
    data = ShapeNet1D(shapenet1d_path, cfg.img_size, seed=cfg.seed,
                      data_size=cfg.data_size, aug=cfg.aug_list,
                      max_ctx=cfg.max_ctx_num, query_num=cfg.query_num)
    model = build_model(cfg)
    trainer = ModelTrainer(model, cfg, data)
    trainer.train()

    # checkpoints + artifacts exist with reference naming
    models_dir = os.path.join(cfg.save_path, "models")
    assert os.path.isdir(os.path.join(models_dir, "model_intermediate"))
    assert os.path.isdir(os.path.join(models_dir, f"model_end_{cfg.iterations}"))
    assert os.path.isdir(os.path.join(models_dir, "model_best_validation"))
    assert os.path.isfile(os.path.join(cfg.save_path, "best_validation_error.txt"))
    assert os.path.isfile(os.path.join(cfg.save_path, "metrics.jsonl"))
    assert trainer.best_loss["validation"] < 50000
