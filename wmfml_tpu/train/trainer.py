"""Meta-training driver for the CNP/ANP/FCL/SingleTask families.

Control flow mirrors trainer/model_trainer.py:
  * iteration-based loop (not epochs);
  * ShapeNet3D backgrounds regenerated every ``bg_gen_freq`` iters (:39-40);
  * validation every ``val_freq`` on validation AND test splits, test skipped
    for pascal_1d (:46-49); eval streams made deterministic by resetting the
    split RNG to 42 (:102-109);
  * best-per-split checkpoints + error txt (:130-138), intermediate model
    every 1000 iters (:52-53,141-143), final model at completion (:55);
  * abort on non-finite loss (:90-92) — raised as NonFiniteLossError; the CLI
    converts it to exit(1) for parity.

TPU-first differences:
  * the NaN guard reads the *previous* step's loss while the current step is
    in flight — the device never idles on a host sync;
  * episode sampling runs in a background prefetch thread feeding the mesh.
"""

from __future__ import annotations

import math
import queue
import threading
from typing import Optional

import jax
import numpy as np

from wmfml_tpu.ckpt.checkpoint import CheckpointManager
from wmfml_tpu.obs import MetricsWriter, NonFiniteLossError
from wmfml_tpu.parallel.mesh import MeshContext
from wmfml_tpu.train.state import TrainState, build_optimizer
from wmfml_tpu.train.steps import build_eval_step, build_train_step, init_model


class Prefetcher:
    """Background thread sampling episodes and staging them on the mesh."""

    def __init__(self, sample_fn, put_fn, depth: int = 2):
        self.sample_fn = sample_fn
        self.put_fn = put_fn
        self.q: queue.Queue = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._exc = None
        self.thread = threading.Thread(target=self._run, daemon=True)
        self.thread.start()

    def _run(self):
        try:
            while not self._stop.is_set():
                batch = self.put_fn(self.sample_fn())
                while not self._stop.is_set():
                    try:
                        self.q.put(batch, timeout=0.2)
                        break
                    except queue.Full:
                        continue
        except Exception as e:  # surfaced on next __next__
            self._exc = e

    def __next__(self):
        while True:
            if self._exc is not None:
                raise self._exc
            try:
                return self.q.get(timeout=1.0)
            except queue.Empty:
                continue

    def close(self):
        self._stop.set()


class ModelTrainer:
    def __init__(self, model, config, data, mesh_ctx: Optional[MeshContext] = None,
                 writer: Optional[MetricsWriter] = None):
        self.model = model
        self.config = config
        self.data = data
        self.mesh = mesh_ctx or MeshContext.create(
            config.mesh_shape, batch_divisor=config.tasks_per_batch)
        self.logger = config.logger
        self.writer = writer or MetricsWriter(config.save_path)
        self.ckpt = CheckpointManager(config.save_path)
        # reference best-loss thresholds (trainer/base_trainer.py:27)
        self.best_loss = {"validation": 50000.0, "test": 20000.0}

        self.steps_per_call = max(
            int(getattr(config, "steps_per_call", 1) or 1), 1)
        self.device_sampler = None  # set by _build_steps when enabled
        tx = self._build_optimizer()
        key = jax.random.PRNGKey(config.seed)
        self.base_key = key
        variables = self._init_variables(key)
        state = TrainState.create(variables, tx)
        self.state = jax.device_put(state, self.mesh.replicated)
        self._build_steps(tx)

        if config.checkpoint:
            from wmfml_tpu.ckpt.torch_import import maybe_restore_torch

            torch_state = maybe_restore_torch(config, config.checkpoint,
                                              self.state)
            if torch_state is not None:     # reference .pt checkpoint
                self.state = jax.device_put(torch_state, self.mesh.replicated)
                self.logger.info(
                    f"imported torch checkpoint {config.checkpoint}")
            else:
                self.state = self.ckpt.restore(config.checkpoint, self.state)
                self.logger.info(f"resumed from {config.checkpoint} "
                                 f"at step {int(self.state.step)}")

    # -- overridable by MAML/MMAML subclasses ---------------------------

    def _build_optimizer(self):
        """Optimizer used for the initial TrainState (MMAML overrides with
        its multi_transform pair, avoiding a second jitted tx.init)."""
        return build_optimizer(self.config)

    def _init_variables(self, key):
        return init_model(self.model, self.config, key)

    def _build_steps(self, tx):
        self.device_sampler = None
        if self.config.device_data in ("auto", True, "true"):
            from wmfml_tpu.data.device_sampler import from_dataset

            self.device_sampler = from_dataset(self.data, self.config)
            if self.device_sampler is None and self.config.device_data not in ("auto",):
                self.logger.info("device_data requested but split layout/size "
                                 "unsupported; falling back to host streaming")
        if self.device_sampler is not None:
            from wmfml_tpu.train.steps import build_device_data_train_step

            self.train_step = build_device_data_train_step(
                self.model, self.config, self.device_sampler, self.mesh, tx,
                self.steps_per_call)
            self.logger.info(
                f"train split resident in HBM; on-device episode sampling, "
                f"{self.steps_per_call} step(s) per dispatch")
            # eval splits upload lazily at first validate(): for ShapeNet3D
            # the pre-train gen_bg recomposites backgrounds AFTER __init__,
            # and the device copy must match the host arrays
            self._want_device_eval = True
        elif self.steps_per_call > 1:
            from wmfml_tpu.train.steps import build_multi_train_step

            self.train_step = build_multi_train_step(
                self.model, self.config, self.mesh, tx, self.steps_per_call)
        else:
            self.train_step = build_train_step(self.model, self.config,
                                               self.mesh, tx)
        self.eval_step = build_eval_step(self.model, self.config, self.mesh)

    # ------------------------------------------------------------------

    def _sample_train(self):
        cfg = self.config
        if self.steps_per_call > 1:
            eps = [self.data.get_batch("train", cfg.tasks_per_batch,
                                       cfg.max_ctx_num)
                   for _ in range(self.steps_per_call)]
            return {k: np.stack([e[k] for e in eps]) for k in eps[0]}
        return self.data.get_batch("train", cfg.tasks_per_batch,
                                   cfg.max_ctx_num)

    def _put_train_batch(self, batch):
        if self.steps_per_call > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P

            return jax.device_put(
                batch, NamedSharding(self.mesh.mesh, P(None, "data")))
        return self.mesh.put_batch(batch)

    def train(self):
        cfg = self.config
        skip_test = cfg.task == "pascal_1d"
        start = int(self.state.step)

        if cfg.task == "shapenet_3d" and cfg.gen_bg:
            self.data.gen_bg(cfg)

        device_data = self.device_sampler is not None
        prefetch = None
        if not device_data:
            prefetch = Prefetcher(self._sample_train, self._put_train_batch,
                                  depth=cfg.prefetch)
        pending = None  # (step_idx, device_loss) for the async NaN guard
        k = self.steps_per_call
        try:
            for it in range(start, cfg.iterations, k):
                # host-side split recompositing only on the streaming path;
                # the device sampler composites fresh backgrounds per batch
                if (not device_data and cfg.task == "shapenet_3d"
                        and cfg.gen_bg and it > start
                        and it % cfg.bg_gen_freq < k):
                    self.data.gen_bg(cfg, data="train")

                key = jax.random.fold_in(self.base_key, it)
                if device_data:
                    self.state, metrics = self.train_step(self.state, key)
                else:
                    batch = next(prefetch)
                    self.state, metrics = self.train_step(self.state, batch,
                                                          key)

                # NaN guard: keep the loss on device and only force a host
                # sync at log boundaries — a per-call scalar fetch costs a
                # full host<->device round trip (reference checks every iter;
                # here abort latency is <= val_freq iterations)
                pending = (it, metrics["loss"])

                if it % cfg.val_freq < k:
                    train_loss = self._guard(*pending)
                    pending = None
                    self.writer.add_scalar("Loss/train", train_loss, it)
                    self.logger.info(f"Iteration: {it}, loss: {train_loss:.4f}")
                    self.validate(it, "validation")
                    if not skip_test:
                        self.validate(it, "test")

                if it % 1000 < k:
                    self.ckpt.save("model_intermediate", self.state)

            if pending is not None:
                self._guard(*pending)
            self.ckpt.save(f"model_end_{cfg.iterations}", self.state)
        finally:
            if prefetch is not None:
                prefetch.close()
            self.ckpt.wait()   # drain the async checkpoint queue
            self.writer.flush()

    def _guard(self, step_idx: int, device_loss) -> float:
        loss = float(device_loss)
        if not math.isfinite(loss):
            self.logger.error(f"Loss is NaN or Inf at iteration {step_idx}")
            raise NonFiniteLossError(
                f"Loss is NaN or Inf at iteration {step_idx}: {loss}")
        return loss

    def _make_device_sweep(self, split):
        """Sweep builder hook — MAML/MMAML override with the adapted-eval
        variant (train/maml.py build_outer_device_sweep)."""
        from wmfml_tpu.data.device_eval import build_device_eval_sweep

        return build_device_eval_sweep(self.model, self.config, split,
                                       self.mesh)

    def _setup_device_eval(self):
        """Device-resident val/test splits + one-dispatch eval sweeps."""
        self._device_eval = {}
        if not hasattr(self.data, "get_batch_indices"):
            return
        from wmfml_tpu.data.device_eval import split_from_dataset

        sources = ["validation"] + ([] if self.config.task == "pascal_1d"
                                    else ["test"])
        for source in sources:
            split = split_from_dataset(self.data, self.config, source)
            if split is not None:
                self._device_eval[source] = self._make_device_sweep(split)
        if self._device_eval:
            self.logger.info(
                f"eval splits resident in HBM: {sorted(self._device_eval)}")

    def _device_validate(self, source: str) -> list:
        """Host generates deterministic indices; one dispatch evaluates all."""
        cfg = self.config
        self.data.reset_eval(source, seed=42)
        cls, ctx_i, qry_i = [], [], []
        s = cfg.max_ctx_num
        for _ in range(cfg.val_iters):
            groups, take, shot = self.data.get_batch_indices(
                source, cfg.tasks_per_batch, s)
            assert shot == s, "eval shot must be the requested ctx count"
            # loud, not silently-clamped: in mode='eval' datasets the index
            # table is only v views wide and numpy would truncate the slice
            assert take.shape[1] >= s + cfg.query_num, (
                f"index table too narrow ({take.shape[1]} < "
                f"{s + cfg.query_num}) — mode='eval' datasets must go "
                "through the evaluator's query_all sweep, not the trainer")
            cls.append(groups)
            ctx_i.append(take[:, :s])
            qry_i.append(take[:, s:s + cfg.query_num])
        import jax.numpy as jnp

        # per-batch keys identical to the host validate stream (stochastic
        # BBB models must score the same on either path)
        keys = jnp.stack([jax.random.fold_in(self.base_key, 10_000_000 + v)
                          for v in range(cfg.val_iters)])
        losses = self._device_eval[source](
            self.state, np.stack(cls), np.stack(ctx_i), np.stack(qry_i),
            keys)
        return list(np.asarray(jax.device_get(losses)))

    # ------------------------------------------------------------------

    def validate(self, it: int, source: str) -> float:
        """One deterministic eval sweep (trainer/model_trainer.py:95-139)."""
        cfg = self.config
        if getattr(self, "_want_device_eval", False) and not hasattr(
                self, "_device_eval"):
            self._setup_device_eval()
        if source in getattr(self, "_device_eval", {}):
            losses = self._device_validate(source)
        else:
            self.data.reset_eval(source, seed=42)
            losses = []
            for v in range(cfg.val_iters):
                batch = self.mesh.put_batch(
                    self.data.get_batch(source, cfg.tasks_per_batch,
                                        cfg.max_ctx_num))
                key = jax.random.fold_in(self.base_key, 10_000_000 + v)
                losses.append(self.eval_step(self.state, batch, key))
        loss = float(np.mean(jax.device_get(losses)))
        self.writer.add_scalar(f"Loss/{source}", loss, it)
        self.logger.info(f"[{source}] iteration {it}: loss {loss:.4f}")
        if loss < self.best_loss[source]:
            self.best_loss[source] = loss
            self.ckpt.save(f"model_best_{source}", self.state)
            self.ckpt.save_best_error(cfg.save_path, source, it, loss)
        return loss
