"""Qualitative evaluation: render query images with GT vs predicted labels.

Parity with the reference's three evaluate_and_plot_* scripts:
  * shapenet1d — per-query image annotated with gt/pred azimuth in degrees
    (decode via acos + sin-sign branch, evaluate_and_plot_shapenet1d.py:35-68);
    fixed ctx = 15 (:143); losses_all.txt with per-batch losses (:127-128).
  * shapenet3d — quaternion -> intrinsic ZYX Euler angles for annotation
    (evaluate_and_plot_shapenet3d.py:45-48, scipy convention).
  * distractor — scatter predicted/gt centers on the (re-inverted) image
    (evaluate_and_plot_distractor.py:49-71,131); test category '04530566'.
"""

from __future__ import annotations

import math
import os

import jax
import numpy as np


def _angle_deg_from_sincos(cos_v, sin_v):
    base = np.arccos(np.clip(cos_v, -1.0, 1.0))
    rad = np.where(sin_v >= 0, base, 2.0 * math.pi - base)
    return np.rad2deg(rad)


def plot_queries(task: str, images, gt_y, pr_y, out_dir: str, batch_idx: int,
                 max_plots: int = 8):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from wmfml_tpu.utils.quaternion import quat_to_euler_zyx

    os.makedirs(out_dir, exist_ok=True)
    t = 0  # first task of the batch, as the reference plots
    n = min(images.shape[1], max_plots)
    fig, axes = plt.subplots(1, n, figsize=(2.2 * n, 2.8))
    if n == 1:
        axes = [axes]
    for i in range(n):
        img = np.asarray(images[t, i])
        if img.shape[-1] == 1:
            axes[i].imshow(1.0 - img[..., 0], cmap="gray")
        else:
            axes[i].imshow(np.clip(img[..., :3], 0, 1))
        axes[i].axis("off")
        if task == "shapenet_1d":
            gt = np.rad2deg(gt_y[t, i, -1])
            pr = _angle_deg_from_sincos(pr_y[t, i, 0], pr_y[t, i, 1])
            axes[i].set_title(f"gt {gt:.0f}\npr {pr:.0f}", fontsize=8)
        elif task == "shapenet_3d":
            gt_e = np.asarray(quat_to_euler_zyx(gt_y[t, i]))
            q = pr_y[t, i] / max(np.linalg.norm(pr_y[t, i]), 1e-8)
            pr_e = np.asarray(quat_to_euler_zyx(q))
            axes[i].set_title(
                f"gt {gt_e[0]:.0f}/{gt_e[2]:.0f}\npr {pr_e[0]:.0f}/{pr_e[2]:.0f}",
                fontsize=8)
        elif task == "distractor":
            axes[i].scatter([gt_y[t, i, 0]], [gt_y[t, i, 1]], c="lime", s=14,
                            label="gt")
            axes[i].scatter([pr_y[t, i, 0]], [pr_y[t, i, 1]], c="red", s=14,
                            label="pred")
    fig.tight_layout()
    fig.savefig(os.path.join(out_dir, f"batch_{batch_idx:03d}.png"), dpi=110)
    plt.close(fig)


def evaluate_and_plot(config, ctx_num: int = 15):
    """Shared driver for the three plot CLIs."""
    from wmfml_tpu.data.factory import build_data
    from wmfml_tpu.eval.evaluator import ModelEvaluator
    from wmfml_tpu.models.registry import build_model
    from wmfml_tpu.train.steps import make_forward

    # the reference's distractor plot script restricts the test split to
    # category '04530566' (evaluate_and_plot_distractor.py:44)
    test_categ = ["04530566"] if config.task == "distractor" else None
    data = build_data(config, mode="eval", test_categ=test_categ)
    config.query_num = getattr(data, "query_num", config.query_num)
    model = build_model(config)
    evaluator = ModelEvaluator(model, config, data)
    # jitted: an eager forward is hundreds of per-op remote compiles on the
    # axon platform (see RESULTS.md eager-dispatch hazard)
    forward = jax.jit(make_forward(model, config, train=False))

    losses = []
    out_dir = os.path.join(config.save_path, "plots")
    data.reset_eval("test", 42)
    from wmfml_tpu.losses import LossFunc

    loss_func = LossFunc(config.loss_type, config.task)
    for i in range(config.val_iters):
        batch = evaluator.mesh.put_batch(
            data.get_batch("test", config.tasks_per_batch, ctx_num))
        key = jax.random.fold_in(evaluator.base_key, i)
        out, pbatch = forward(evaluator.state.model_variables(), batch, key)
        loss = float(loss_func.calc_loss(
            np.asarray(out.mu, np.float32), out.var, pbatch["qry_y"],
            test=True))
        losses.append(loss)
        plot_queries(config.task, jax.device_get(pbatch["qry_x"]),
                     jax.device_get(pbatch["qry_y"]),
                     np.asarray(jax.device_get(out.mu), np.float32),
                     out_dir, i)
    np.savetxt(os.path.join(config.save_path, "losses_all.txt"),
               np.asarray(losses), fmt="%1.4f")
    config.logger.info(
        f"mean test loss over {len(losses)} batches: {np.mean(losses):.4f}")
    return losses
