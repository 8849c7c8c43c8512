"""Evaluation-CLI device-resident sweep == host-streamed sweep, all 4 tasks.

Covers VERDICT round-1 items: the full loss-vs-ctx sweep (ctx 1..max x
val_iters x splits) running as one dispatch from HBM-resident splits, the
mode='eval' all-view query protocol, and rng-42 determinism of the eval CLI
across host and device paths.
"""

import os

import numpy as np
import pytest

from wmfml_tpu.configs import Config
from wmfml_tpu.data.factory import build_data
from wmfml_tpu.eval.evaluator import ModelEvaluator
from wmfml_tpu.models.registry import build_model

pytestmark = __import__("pytest").mark.slow  # multi-minute CPU smoke

DATA_ROOT = os.path.join(os.path.dirname(__file__), "..", "data_synth")

BASE = dict(
    checkpoint="", loss_type="mse", tasks_per_batch=2, max_ctx_num=3,
    noise_scale=0.0, lr=1e-3, weight_decay=False, optimizer="Adam",
    bg_gen_freq=100, val_iters=2, val_freq=2, iterations=3, device="cpu",
    seed=1, aug_list=[], dim_w=32, n_hidden_units_r=[64, 64], dim_r=32,
    dim_z=32, data_size="small", synthetic_data=True, mode="evaluation",
)

CASES = [
    ("CNPShapeNet1D", "shapenet_1d", dict(agg_mode="max")),
    ("CondNeuralProcess", "shapenet_3d", dict(agg_mode="mean",
                                              img_agg="reshape")),
    ("CNPDistractor", "distractor", dict(agg_mode="max", img_agg="max",
                                         dim_w=16)),
    ("CNPVanillaPascal1D", "pascal_1d", dict(agg_mode="max")),
    # stochastic model: BBB samples weights at eval; passes only because the
    # device sweep consumes the HOST path's exact per-batch rng keys
    ("CNPMRShapeNet1D", "shapenet_1d", dict(agg_mode="max")),
]


@pytest.mark.parametrize("method,task,extra", CASES)
def test_eval_cli_device_matches_host(tmp_path, monkeypatch, method, task,
                                      extra):
    monkeypatch.chdir(os.path.join(os.path.dirname(__file__), ".."))
    d = dict(BASE, method=method, task=task, **extra)
    cfg = Config.from_dict(d, make_dirs=True, results_root=str(tmp_path))
    data = build_data(cfg, mode="eval")
    cfg.query_num = getattr(data, "query_num", cfg.query_num)
    model = build_model(cfg)
    ev = ModelEvaluator(model, cfg, data)

    sources = ["validation"] + ([] if task == "pascal_1d" else ["test"])
    for source in sources:
        dev = ev._device_sweep(source)
        assert dev is not None, f"device sweep must engage for {task}"
        cfg.device_data = "off"
        host_losses, host_stds = ev._sweep_source(source)
        cfg.device_data = "auto"
        np.testing.assert_allclose(dev[0], host_losses, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(dev[1], host_stds, rtol=1e-3, atol=1e-4)


def test_eval_cli_all_view_queries_shapenet3d(tmp_path, monkeypatch):
    """mode='eval' protocol: query block = ALL 30 views of each item
    (dataset/shapenet_3d.py:201-204)."""
    monkeypatch.chdir(os.path.join(os.path.dirname(__file__), ".."))
    d = dict(BASE, method="CondNeuralProcess", task="shapenet_3d",
             agg_mode="mean", img_agg="reshape")
    cfg = Config.from_dict(d, make_dirs=True, results_root=str(tmp_path))
    data = build_data(cfg, mode="eval")
    cfg.query_num = data.query_num
    assert cfg.query_num == data.instances_per_item == 30
    b = data.get_batch("validation", 2, 3)
    assert b["qry_x"].shape[1] == 30
