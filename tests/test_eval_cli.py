"""Evaluator sweeps, qualitative plotting, refinement — e2e on synthetic data."""

import os

import numpy as np
import pytest

from wmfml_tpu.configs import Config
from wmfml_tpu.data.factory import build_data
from wmfml_tpu.data.refinement import RefinementSampler
from wmfml_tpu.eval.evaluator import ModelEvaluator
from wmfml_tpu.eval.plotting import evaluate_and_plot
from wmfml_tpu.models.registry import build_model

pytestmark = __import__("pytest").mark.slow  # multi-minute CPU smoke

DATA_ROOT = os.path.join(os.path.dirname(__file__), "..", "data_synth")


def eval_cfg(tmp_path, **kw):
    d = dict(
        method="CNPShapeNet1D", task="shapenet_1d", aug_list=[],
        checkpoint="", agg_mode="max", loss_type="mse", tasks_per_batch=2,
        max_ctx_num=3, query_num=4, data_size="small", dim_w=64,
        n_hidden_units_r=[100, 100], dim_r=64, dim_z=64, noise_scale=0.0,
        lr=1e-3, weight_decay=False, optimizer="Adam", bg_gen_freq=100,
        val_iters=2, val_freq=2, iterations=3, device="cpu", seed=1,
        synthetic_data=True, mode="evaluation",
    )
    d.update(kw)
    cfg = Config.from_dict(d, make_dirs=True, results_root=str(tmp_path))
    return cfg


def test_evaluate_sweep_writes_artifacts(tmp_path, monkeypatch):
    monkeypatch.chdir(os.path.join(os.path.dirname(__file__), ".."))
    cfg = eval_cfg(tmp_path)
    data = build_data(cfg, mode="eval")
    cfg.query_num = getattr(data, "query_num", cfg.query_num)
    model = build_model(cfg)
    ev = ModelEvaluator(model, cfg, data)
    val_losses, test_losses = ev.evaluate()
    assert len(val_losses) == cfg.max_ctx_num
    assert os.path.isfile(os.path.join(cfg.save_path, "val_losses.txt"))
    assert os.path.isfile(os.path.join(cfg.save_path, "test_losses.txt"))
    assert os.path.isfile(os.path.join(cfg.save_path, "loss_vs_ctx_num.png"))
    txt = np.loadtxt(os.path.join(cfg.save_path, "val_losses.txt"))
    assert txt.shape == (cfg.max_ctx_num, 3)  # index, loss, std


def test_evaluate_and_plot(tmp_path, monkeypatch):
    monkeypatch.chdir(os.path.join(os.path.dirname(__file__), ".."))
    cfg = eval_cfg(tmp_path, mode="eval_and_plot", val_iters=1)
    losses = evaluate_and_plot(cfg, ctx_num=2)
    assert len(losses) == 1 and np.isfinite(losses[0])
    assert os.path.isfile(os.path.join(cfg.save_path, "losses_all.txt"))
    plots = os.listdir(os.path.join(cfg.save_path, "plots"))
    assert any(p.endswith(".png") for p in plots)


def test_refinement_sampler_and_refine(tmp_path, monkeypatch):
    monkeypatch.chdir(os.path.join(os.path.dirname(__file__), ".."))
    cfg = eval_cfg(tmp_path, method="SingleTaskShapeNet1D", mode="refinement",
                   iterations=2, val_freq=2, val_iters=1)
    base = build_data(cfg, mode="eval")
    data = RefinementSampler(base, ctx_num=3, seed=42, source="test")
    cfg.query_num = data.task_qry_x.shape[0]
    model = build_model(cfg)
    ev = ModelEvaluator(model, cfg, data)
    best, step = ev.refine()
    assert np.isfinite(best) and best < 10000
    # refine_train batches: query == context
    b = data.get_batch("refine_train", 2, 3)
    np.testing.assert_array_equal(b["ctx_x"], b["qry_x"])
