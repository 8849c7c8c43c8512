"""Statistical evaluator + single-task refinement.

Protocol parity with evaluator/model_evaluator.py:
  * ``evaluate()``   — loss vs ctx_num for ctx in 1..max_ctx_num on validation
    (+ test unless pascal_1d), ``val_iters`` deterministic batches per point
    (split RNG reseeded to 42 before each sweep, :151-158); writes
    ``val_losses.txt`` / ``test_losses.txt`` (index, loss, std-over-batches)
    and ``loss_vs_ctx_num.png`` (:111-122, 200-224).
  * ``evaluate_one_task()`` — test-only variant (:124-142).
  * ``refine()``     — fine-tune a (SingleTask) model on 'refine_train'
    batches where prediction is made from the context images alone and the
    loss is against the context labels (:66-93); tracks best test loss.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from wmfml_tpu.ckpt.checkpoint import CheckpointManager
from wmfml_tpu.losses import LossFunc
from wmfml_tpu.obs import MetricsWriter, check_finite
from wmfml_tpu.parallel.mesh import MeshContext
from wmfml_tpu.train.state import TrainState, build_optimizer
from wmfml_tpu.train.steps import build_eval_step, init_model, make_forward


class ModelEvaluator:
    def __init__(self, model, config, data,
                 mesh_ctx: Optional[MeshContext] = None,
                 state: Optional[TrainState] = None):
        self.model = model
        self.config = config
        self.data = data
        self.logger = config.logger
        self.mesh = mesh_ctx or MeshContext.create(
            config.mesh_shape, batch_divisor=config.tasks_per_batch)
        self.writer = MetricsWriter(config.save_path)
        self.ckpt = CheckpointManager(config.save_path)
        self.best_loss = {"validation": 10000.0, "test": 10000.0}  # base_evaluator.py:27

        tx = build_optimizer(config)
        self.base_key = jax.random.PRNGKey(config.seed)
        if state is None:
            variables = init_model(model, config, self.base_key)
            state = TrainState.create(variables, tx)
            if config.checkpoint:
                from wmfml_tpu.ckpt.torch_import import maybe_restore_torch

                torch_state = maybe_restore_torch(config, config.checkpoint,
                                                  state)
                if torch_state is not None:  # reference .pt checkpoint
                    state = torch_state
                    self.logger.info(
                        f"imported torch checkpoint {config.checkpoint}")
                else:
                    state = self.ckpt.restore(config.checkpoint, state)
                    self.logger.info(
                        f"loaded checkpoint {config.checkpoint}")
        self.state = jax.device_put(state, self.mesh.replicated)
        self.eval_step = build_eval_step(model, config, self.mesh)
        self._refine_step = None  # built lazily

    # ------------------------------------------------------------------

    def _device_sweep(self, source: str):
        """Full loss-vs-ctx sweep on device: ONE dispatch for all
        max_ctx_num x val_iters batches. Returns (losses, stds) lists or
        None when the split can't be device-resident.

        Index streams are the host sampler's own (rng-42 reseeded per ctx
        point, evaluator/model_evaluator.py:151-158), so the episode
        sequence is bit-identical to the host path; mode='eval' all-view
        queries are the full view permutation as the query index block.
        """
        cfg = self.config
        if getattr(cfg, "device_data", "auto") not in ("auto", True, "true"):
            return None
        if not hasattr(self.data, "get_batch_indices"):
            return None
        eval_mode = getattr(self.data, "mode", None) == "eval"
        if not hasattr(self, "_sweeps"):
            self._sweeps = {}
        if source not in self._sweeps:
            from wmfml_tpu.data.device_eval import (
                build_device_eval_ctx_sweep, split_from_dataset)

            split = split_from_dataset(self.data, cfg, source,
                                       query_all=eval_mode)
            self._sweeps[source] = None if split is None else \
                build_device_eval_ctx_sweep(self.model, cfg, split, self.mesh)
        sweep = self._sweeps[source]
        if sweep is None:
            return None

        s, q, vi = cfg.max_ctx_num, cfg.query_num, cfg.val_iters
        cls, ctx, shots, qry = [], [], [], []
        for ctx_num in range(1, s + 1):
            self.data.reset_eval(source, seed=42)
            for _ in range(vi):
                groups, take, shot = self.data.get_batch_indices(
                    source, cfg.tasks_per_batch, ctx_num)
                assert shot == ctx_num, "eval shot must equal the ctx point"
                ci = np.pad(take[:, :shot], ((0, 0), (0, s - shot)),
                            mode="edge")
                cls.append(groups)
                ctx.append(ci)
                shots.append(shot)
                qry.append(take if eval_mode else take[:, shot:shot + q])
        # per-batch keys identical to the host _validate_iter stream, so
        # stochastic (BBB) models score the same on either path
        keys = jnp.stack([jax.random.fold_in(self.base_key, 20_000_000 + v)
                          for v in range(vi)] * s)
        losses = sweep(self.state, np.stack(cls), np.stack(ctx),
                       np.asarray(shots, np.int32), np.stack(qry), keys)
        per_ctx = np.asarray(jax.device_get(losses),
                             np.float64).reshape(s, vi)
        means = [float(m) for m in per_ctx.mean(axis=1)]
        stds = [float(r.std(ddof=1)) if vi > 1 else 0.0 for r in per_ctx]
        for m, r in zip(means, stds):
            self.logger.info(f"{source} loss: {m:.4f}\n{source} std: {r:.4f}")
        return means, stds

    def _sweep_source(self, source: str):
        """(losses, stds) over ctx 1..max — device path, host fallback."""
        dev = self._device_sweep(source)
        if dev is not None:
            self.logger.info(f"[{source}] sweep ran device-resident "
                             f"(one dispatch)")
            return dev
        losses, stds = [], []
        for ctx_num in range(1, self.config.max_ctx_num + 1):
            loss, std = self._validate_iter(source, ctx_num)
            losses.append(loss)
            stds.append(std)
        return losses, stds

    def _validate_iter(self, source: str, max_ctx_num: int):
        cfg = self.config
        self.data.reset_eval(source, seed=42)
        losses = []
        for v in range(cfg.val_iters):
            batch = self.mesh.put_batch(
                self.data.get_batch(source, cfg.tasks_per_batch, max_ctx_num))
            key = jax.random.fold_in(self.base_key, 20_000_000 + v)
            losses.append(self.eval_step(self.state, batch, key))
        losses = np.asarray(jax.device_get(losses), np.float64)
        loss, std = float(losses.mean()), float(losses.std(ddof=1)) if len(losses) > 1 else 0.0
        self.logger.info(f"{source} loss: {loss:.4f}\n{source} std: {std:.4f}")
        return loss, std

    def evaluate(self):
        cfg = self.config
        self.logger.info("================== Start Evaluation ===================")
        val_losses, val_std = self._sweep_source("validation")
        test_losses, test_std = [], []
        if cfg.task != "pascal_1d":
            test_losses, test_std = self._sweep_source("test")

        index = list(range(1, cfg.max_ctx_num + 1))
        np.savetxt(f"{cfg.save_path}/val_losses.txt",
                   np.column_stack((index, val_losses, val_std)), fmt="%1.4f")
        if cfg.task != "pascal_1d":
            np.savetxt(f"{cfg.save_path}/test_losses.txt",
                       np.column_stack((index, test_losses, test_std)),
                       fmt="%1.4f")
        self.ckpt.save("model", self.state)
        self._plot_loss_vs_ctx(index, val_losses, val_std, test_losses,
                               test_std)
        self.ckpt.wait()   # drain the async checkpoint queue before exit
        self.logger.info("================= Evaluation finished =================")
        return val_losses, test_losses

    def evaluate_one_task(self):
        cfg = self.config
        test_losses, test_std = self._sweep_source("test")
        index = list(range(1, cfg.max_ctx_num + 1))
        np.savetxt(f"{cfg.save_path}/test_losses.txt",
                   np.column_stack((index, test_losses, test_std)), fmt="%1.4f")
        self.ckpt.save("model", self.state)
        self._plot_loss_vs_ctx(index, None, None, test_losses, test_std)
        self.ckpt.wait()
        return test_losses

    # ------------------------------------------------------------------

    def refine(self):
        """Fine-tune on 'refine_train' episodes (refinement.py protocol)."""
        import optax

        cfg = self.config
        if self._refine_step is None:
            loss_func = LossFunc(cfg.loss_type, cfg.task)
            forward = make_forward(self.model, cfg, train=True)
            tx = build_optimizer(cfg)
            beta = float(cfg.beta or 0.0)

            def refine_step(state, batch, key):
                def loss_fn(params):
                    variables = {"params": params, **state.extra_vars}
                    out, pbatch = forward(variables, batch, key)
                    # prediction from context images alone, loss vs ctx labels
                    loss = loss_func.calc_loss(
                        out.mu.astype(np.float32), out.var, pbatch["qry_y"],
                        test=False, mask=pbatch["ctx_mask"])
                    return loss + beta * out.kl, loss
                grads, loss = jax.grad(loss_fn, has_aux=True)(state.params)
                updates, new_opt = tx.update(grads, state.opt_state, state.params)
                params = optax.apply_updates(state.params, updates)
                return state.replace(step=state.step + 1, params=params,
                                     opt_state=new_opt), loss
            self._refine_step = jax.jit(refine_step, donate_argnums=(0,))

        best_step = -1
        for it in range(cfg.iterations + 1):
            if (cfg.task == "shapenet_3d" and cfg.gen_bg
                    and it % cfg.bg_gen_freq == 0):
                self.data.gen_bg(cfg, data="train")
            batch = self.data.get_batch("refine_train", cfg.tasks_per_batch,
                                        cfg.max_ctx_num)
            key = jax.random.fold_in(self.base_key, it)
            self.state, loss = self._refine_step(self.state, batch, key)

            if it % cfg.val_freq == 0:
                loss_f = check_finite(loss, it, self.logger)
                self.writer.add_scalar("Loss/train", loss_f, it)
                self._validate_iter("validation", cfg.max_ctx_num)
                if cfg.task != "pascal_1d":
                    test_loss, std = self._validate_iter("test", cfg.max_ctx_num)
                    if test_loss < self.best_loss["test"]:
                        self.best_loss["test"] = test_loss
                        best_step = it
                        self.ckpt.save("best_test_model", self.state)
                        with open(os.path.join(cfg.save_path,
                                               "best_test_error.txt"), "a") as f:
                            f.write(f"Best Step: {it} \n")
                            f.write(f"Best test Loss: \n{test_loss}\n")
                            f.write(f"Best test Loss std: \n{std}\n")
        self.ckpt.save(f"model_end_{cfg.iterations}", self.state)
        self.ckpt.wait()
        return self.best_loss["test"], best_step

    # ------------------------------------------------------------------

    def _plot_loss_vs_ctx(self, index, val_losses, val_std, test_losses,
                          test_std):
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        if val_losses is not None:
            v, s = np.asarray(val_losses), np.asarray(val_std)
            plt.plot(index, v, label="val")
            plt.fill_between(index, v - s, v + s, alpha=0.1)
        if test_losses:
            t, s = np.asarray(test_losses), np.asarray(test_std)
            plt.plot(index, t, label="test")
            plt.fill_between(index, t - s, t + s, alpha=0.1)
        plt.legend(loc="best")
        plt.xlabel("ctx_num")
        plt.ylabel("error(pixel)")
        plt.savefig(f"{self.config.save_path}/loss_vs_ctx_num.png")
        plt.clf()
