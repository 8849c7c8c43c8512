"""Full-state resume: checkpoint=<orbax dir> restores (step, params,
opt_state) and training continues where it left off — the capability the
reference's dead resume helper never wired (trainer/model_trainer.py:145-160,
SURVEY §5)."""

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


def _make(tmp_path, tag, **kw):
    cfg = make_cfg(method="CNPShapeNet1D", task="shapenet_1d", agg_mode="max",
                   aug_list=[], val_freq=100, val_iters=1, data_size="small",
                   tasks_per_batch=2, max_ctx_num=5, query_num=4,
                   steps_per_call=2, **kw)
    cfg.results_root = str(tmp_path)
    cfg.save_path = str(tmp_path / tag)
    cfg.create_dirs()
    root = ensure_dataset("shapenet_1d", DATA_ROOT)
    data = ShapeNet1D(root, cfg.img_size, seed=0, data_size="small",
                      max_ctx=cfg.max_ctx_num, query_num=cfg.query_num)
    return cfg, data


def test_orbax_full_state_resume(tmp_path):
    import jax

    cfg1, data1 = _make(tmp_path, "first", iterations=4)
    t1 = ModelTrainer(build_model(cfg1), cfg1, data1)
    t1.train()
    end = os.path.join(cfg1.save_path, "models", "model_end_4")
    assert os.path.isdir(end)
    params_after = jax.device_get(t1.state.params)

    cfg2, data2 = _make(tmp_path, "second", iterations=8, checkpoint=end)
    t2 = ModelTrainer(build_model(cfg2), cfg2, data2)
    assert int(t2.state.step) == 4          # resumed mid-run, not from 0
    w_resumed = jax.device_get(
        t2.state.params)["encoder_w0"]["conv0"]["kernel"]
    np.testing.assert_allclose(
        w_resumed, params_after["encoder_w0"]["conv0"]["kernel"], rtol=1e-6)
    # opt_state restored too (Adam moments non-zero after 4 steps)
    mu = jax.tree_util.tree_leaves(t2.state.opt_state)
    assert any(np.abs(np.asarray(x)).sum() > 0 for x in mu
               if hasattr(x, "shape") and getattr(x, "size", 0) > 1)

    t2.train()                               # continues 4 -> 8
    assert int(t2.state.step) == 8
    assert os.path.isdir(os.path.join(cfg2.save_path, "models",
                                      "model_end_8"))


@pytest.mark.parametrize("saved_flat", [False, True])
def test_restore_converts_flatten_layout(tmp_path, saved_flat):
    """A checkpoint saved under one `flatten_opt` layout restores under the
    other: the opt_state is auto-converted at restore time (round-4 ADVICE —
    the layouts are value-identical for elementwise optimizers, so a default
    flip must not strand existing run dirs)."""
    import jax

    from wmfml_tpu.ckpt.checkpoint import CheckpointManager
    from wmfml_tpu.train.state import TrainState, build_optimizer

    def make_state(flatten, fill=None):
        cfg = make_cfg(method="CNPShapeNet1D", task="shapenet_1d",
                       agg_mode="max", flatten_opt=flatten)
        model = build_model(cfg)
        h, w, c = cfg.img_size
        batch = dict(
            ctx_x=np.zeros((1, 2, h, w, c), np.float32),
            ctx_y=np.zeros((1, 2, 3), np.float32),
            ctx_mask=np.ones((1, 2), bool),
            qry_x=np.zeros((1, 2, h, w, c), np.float32),
        )
        variables = model.init(jax.random.PRNGKey(0), **batch)
        state = TrainState.create(variables, build_optimizer(cfg))
        if fill is not None:
            # distinguishable moments so value fidelity is actually checked
            leaves, treedef = jax.tree_util.tree_flatten(state.opt_state)
            offset = 0
            new_leaves = []
            for leaf in leaves:
                arr = np.asarray(leaf, np.float32)
                new_leaves.append(
                    (np.arange(arr.size, dtype=np.float32) + offset
                     ).reshape(arr.shape).astype(arr.dtype))
                offset += arr.size
            state = state.replace(opt_state=jax.tree_util.tree_unflatten(
                treedef, new_leaves))
        return state

    mgr = CheckpointManager(str(tmp_path))
    src = make_state(flatten=saved_flat, fill=True)
    mgr.save("model_intermediate", src)
    mgr.wait()
    restored = mgr.restore("model_intermediate",
                           make_state(flatten=not saved_flat))
    # same total content, re-laid into the target structure
    src_cat = np.concatenate([np.asarray(x, np.float32).ravel() for x in
                              jax.tree_util.tree_leaves(src.opt_state)])
    dst_cat = np.concatenate([np.asarray(x, np.float32).ravel() for x in
                              jax.tree_util.tree_leaves(restored.opt_state)])
    assert src_cat.size == dst_cat.size
    np.testing.assert_allclose(np.sort(src_cat), np.sort(dst_cat))
    # and the params-shaped moments carry identical values leaf-by-leaf
    flat_state = (src if saved_flat else restored).opt_state
    leaf_state = (restored if saved_flat else src).opt_state
    flat_vecs = [np.asarray(x) for x in jax.tree_util.tree_leaves(flat_state)
                 if np.ndim(x) == 1 and np.size(x) > 1]
    p_leaves = [np.asarray(x, np.float32) for x in
                jax.tree_util.tree_leaves(leaf_state) if np.size(x) > 1]
    n = len(p_leaves) // len(flat_vecs)
    for i, vec in enumerate(flat_vecs):
        got = np.concatenate([x.ravel() for x in
                              p_leaves[i * n:(i + 1) * n]])
        np.testing.assert_allclose(np.asarray(vec, np.float32), got)
