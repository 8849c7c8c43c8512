"""FCL (contrastive) and MR (KL) loss composition through the real trainer."""

import os

import numpy as np

from tests.test_models_np import make_cfg
from wmfml_tpu.data.shapenet_1d import ShapeNet1D
from wmfml_tpu.data.synthetic import ensure_dataset
from wmfml_tpu.models.registry import build_model
from wmfml_tpu.train.trainer import ModelTrainer

pytestmark = __import__("pytest").mark.slow  # multi-minute CPU smoke

DATA_ROOT = os.path.join(os.path.dirname(__file__), "..", "data_synth")


def _data(cfg):
    root = ensure_dataset("shapenet_1d", DATA_ROOT)
    return ShapeNet1D(root, cfg.img_size, seed=0, data_size="small",
                      max_ctx=cfg.max_ctx_num, query_num=cfg.query_num)


def _run(tmp_path, **kw):
    cfg = make_cfg(iterations=4, val_freq=4, val_iters=1, data_size="small",
                   **kw)
    cfg.results_root = str(tmp_path)
    cfg.save_path = str(tmp_path / "run")
    cfg.create_dirs()
    trainer = ModelTrainer(build_model(cfg), cfg, _data(cfg))
    trainer.train()
    return trainer


def test_fcl_trainer_contrastive_term(tmp_path):
    """FCL model + contrastive=True trains; loss includes the NT-Xent term."""
    tr = _run(tmp_path, method="FCLCNPShapeNet1D", task="shapenet_1d",
              agg_mode="max", contrastive=True, contrastive_rate=1.0,
              temperature=0.07, aug_list=["task_aug"])
    assert np.isfinite(tr.best_loss["validation"])
    # the contrastive term must be live in the train graph: total loss with
    # rate 1 differs from a rate-0 run from the identical init
    tr0 = _run(tmp_path / "b", method="FCLCNPShapeNet1D", task="shapenet_1d",
               agg_mode="max", contrastive=True, contrastive_rate=0.0,
               temperature=0.07, aug_list=["task_aug"])
    a = np.concatenate([np.ravel(x) for x in
                        __import__("jax").tree_util.tree_leaves(tr.state.params)])
    b = np.concatenate([np.ravel(x) for x in
                        __import__("jax").tree_util.tree_leaves(tr0.state.params)])
    assert not np.allclose(a, b)


def test_mr_trainer_kl_term(tmp_path):
    """CNPMR + beta>0 trains; BBB KL flows into the update."""
    tr = _run(tmp_path, method="CNPMRShapeNet1D", task="shapenet_1d",
              agg_mode="max", beta=1e-6, aug_list=[])
    assert np.isfinite(tr.best_loss["validation"])
