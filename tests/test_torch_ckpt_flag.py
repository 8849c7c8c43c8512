"""checkpoint=<reference .pt file> loads through the CLIs end-to-end.

The importers (ckpt/torch_import.py) must be reachable from the same
``checkpoint`` config key the reference uses — a reference user should point
at their .pt and run. Covers the evaluator path (evaluation /
evaluate_and_plot / eval_one_task CLIs) and the trainer resume path."""

import os

import jax
import numpy as np
import pytest
import torch

from tests.test_torch_import import TorchSmallCNP
from wmfml_tpu.configs import Config
from wmfml_tpu.data.factory import build_data
from wmfml_tpu.eval.evaluator import ModelEvaluator
from wmfml_tpu.models.registry import build_model


def _cfg(tmp_path, **kw):
    d = dict(
        method="CNPShapeNet1D", task="shapenet_1d", aug_list=[],
        agg_mode="max", loss_type="mse", tasks_per_batch=2, max_ctx_num=3,
        query_num=4, data_size="small", dim_w=64,
        n_hidden_units_r=[100, 100], dim_r=100, dim_z=64, noise_scale=0.0,
        lr=1e-3, weight_decay=False, optimizer="Adam", bg_gen_freq=100,
        val_iters=1, val_freq=2, iterations=2, device="cpu", seed=1,
        synthetic_data=True, mode="evaluation",
    )
    d.update(kw)
    return Config.from_dict(d, make_dirs=True, results_root=str(tmp_path))


def test_evaluator_loads_reference_pt(tmp_path, monkeypatch):
    monkeypatch.chdir(os.path.join(os.path.dirname(__file__), ".."))
    torch.manual_seed(4)
    tmodel = TorchSmallCNP(dim_w=64, dim_r=100, dim_z=64).eval()
    pt = str(tmp_path / "best_test_model.pt")
    torch.save(tmodel.state_dict(), pt)

    cfg = _cfg(tmp_path, checkpoint=pt)
    data = build_data(cfg, mode="eval")
    cfg.query_num = getattr(data, "query_num", cfg.query_num)
    ev = ModelEvaluator(build_model(cfg), cfg, data)

    # weights actually came from the .pt: forward must equal the torch model
    rng = np.random.RandomState(3)
    ctx_x = rng.rand(2, 3, 1, 128, 128).astype(np.float32)
    ctx_y = rng.rand(2, 3, 3).astype(np.float32)
    qry_x = rng.rand(2, 2, 1, 128, 128).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(ctx_x), torch.from_numpy(ctx_y),
                      torch.from_numpy(qry_x)).numpy()
    got = ev.model.apply(
        {"params": jax.device_get(ev.state.params)},
        np.transpose(ctx_x, (0, 1, 3, 4, 2)), ctx_y,
        np.transpose(qry_x, (0, 1, 3, 4, 2)),
        ctx_mask=np.ones((2, 3), bool))
    np.testing.assert_allclose(np.asarray(got.mu), want, rtol=1e-4, atol=1e-5)

    # and the evaluator actually runs with it
    loss, std = ev._validate_iter("validation", 2)
    assert np.isfinite(loss)


def test_trainer_resumes_from_reference_pt(tmp_path, monkeypatch):
    monkeypatch.chdir(os.path.join(os.path.dirname(__file__), ".."))
    from wmfml_tpu.train.trainer import ModelTrainer

    torch.manual_seed(5)
    tmodel = TorchSmallCNP(dim_w=64, dim_r=100, dim_z=64).eval()
    pt = str(tmp_path / "model_intermediate.pt")
    torch.save(tmodel.state_dict(), pt)

    cfg = _cfg(tmp_path, checkpoint=pt, mode="train", iterations=2,
               val_freq=10)
    data = build_data(cfg, mode="train")
    trainer = ModelTrainer(build_model(cfg), cfg, data)
    w = jax.device_get(
        trainer.state.params)["encoder_w0"]["conv0"]["kernel"]
    want = tmodel.state_dict()["encoder_w0.0.weight"].numpy()
    np.testing.assert_allclose(w, np.transpose(want, (2, 3, 1, 0)),
                               rtol=1e-6)


def test_unknown_pt_method_raises(tmp_path):
    from wmfml_tpu.ckpt.torch_import import maybe_restore_torch

    cfg = Config.from_dict(dict(
        method="CNPShapeNet1D", task="shapenet_1d", tasks_per_batch=2,
        max_ctx_num=3, lr=1e-3, seed=0), make_dirs=False)
    # non-.pt paths are not handled here (orbax path takes over)
    assert maybe_restore_torch(cfg, "some/orbax/dir", None) is None
