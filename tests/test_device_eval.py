"""Device-resident validation == host-streamed validation (same episodes)."""

import os

import numpy as np

from tests.test_models_np import make_cfg, shrink_images
from wmfml_tpu.data.shapenet_1d import ShapeNet1D
from wmfml_tpu.data.synthetic import ensure_dataset
from wmfml_tpu.models.registry import build_model
from wmfml_tpu.train.trainer import ModelTrainer

DATA_ROOT = os.path.join(os.path.dirname(__file__), "..", "data_synth")


def test_device_validate_matches_host(tmp_path):
    root = ensure_dataset("shapenet_1d", DATA_ROOT)
    cfg = make_cfg(method="CNPShapeNet1D", task="shapenet_1d", agg_mode="max",
                   aug_list=[], iterations=2, val_freq=10, val_iters=3,
                   data_size="small", tasks_per_batch=2, max_ctx_num=5,
                   query_num=4)
    cfg.results_root = str(tmp_path)
    cfg.save_path = str(tmp_path / "run")
    cfg.create_dirs()
    data = shrink_images(
        ShapeNet1D(root, cfg.img_size, seed=0, data_size="small",
                   max_ctx=cfg.max_ctx_num, query_num=cfg.query_num), cfg)
    trainer = ModelTrainer(build_model(cfg), cfg, data)
    trainer._setup_device_eval()  # lazy in train(); force for the test
    assert "validation" in trainer._device_eval  # device path active

    # device-resident sweep
    dev_losses = trainer._device_validate("validation")

    # host-streamed sweep over the SAME deterministic episode stream
    import jax

    data.reset_eval("validation", 42)
    host_losses = []
    for v in range(cfg.val_iters):
        batch = trainer.mesh.put_batch(
            data.get_batch("validation", cfg.tasks_per_batch,
                           cfg.max_ctx_num))
        key = jax.random.fold_in(trainer.base_key, 10_000_000 + v)
        host_losses.append(float(trainer.eval_step(trainer.state, batch, key)))

    np.testing.assert_allclose(np.asarray(dev_losses),
                               np.asarray(host_losses), rtol=1e-4, atol=1e-5)


def test_trainer_with_device_eval_end_to_end(tmp_path):
    root = ensure_dataset("shapenet_1d", DATA_ROOT)
    cfg = make_cfg(method="CNPShapeNet1D", task="shapenet_1d", agg_mode="max",
                   aug_list=["task_aug"], iterations=4, val_freq=2,
                   val_iters=2, data_size="small", tasks_per_batch=2,
                   max_ctx_num=5, query_num=4, steps_per_call=2)
    cfg.results_root = str(tmp_path)
    cfg.save_path = str(tmp_path / "run")
    cfg.create_dirs()
    data = shrink_images(
        ShapeNet1D(root, cfg.img_size, seed=0, data_size="small",
                   max_ctx=cfg.max_ctx_num, query_num=cfg.query_num), cfg)
    trainer = ModelTrainer(build_model(cfg), cfg, data)
    trainer.train()
    assert trainer.best_loss["validation"] < 50000
