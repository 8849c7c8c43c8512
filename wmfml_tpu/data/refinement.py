"""Refinement sampler — the module the reference ships broken.

``refinement.py``/``eval_one_task.py`` in the reference import a
``dataset.refinement`` module that does not exist (refinement.py:25,
SURVEY §8.1). Its intent, reconstructed from the consumer code
(`evaluator/model_evaluator.py:66-93`, `cfg/refinement/*.yaml`): fix ONE
held-out task; its ``ctx_num`` context points become the fine-tuning training
set ('refine_train' source, prediction from images alone, loss vs their
labels); its query set is the eval stream. Implemented here as a first-class
wrapper over any episodic dataset.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from wmfml_tpu.data.basedata import BaseData
from wmfml_tpu.data.episode import EpisodeBatch


class RefinementSampler(BaseData):
    """Wraps a base dataset, freezing a single task for refinement."""

    def __init__(self, base: BaseData, ctx_num: int, seed: int = 42,
                 source: str = "test", query_num: Optional[int] = None):
        super().__init__(base.img_size, [])
        self.base = base
        self.ctx_num = ctx_num
        self.query_num = query_num or getattr(base, "query_num", ctx_num)
        self.rng = np.random.RandomState(seed)
        self.raw_label_dim = base.raw_label_dim
        self.task_name = base.task_name

        base.reset_eval(source, seed)
        ep = base.get_batch(source, 1, ctx_num)
        # the single frozen task
        n = int(ep["ctx_mask"][0].sum())
        self.task_ctx_x = ep["ctx_x"][0, :n]
        self.task_ctx_y = ep["ctx_y"][0, :n]
        self.task_qry_x = ep["qry_x"][0]
        self.task_qry_y = ep["qry_y"][0]

    def reset_eval(self, source: str, seed: int = 42):
        pass  # the frozen task IS the eval stream; nothing to reseed

    def get_batch(self, source: str, tasks_per_batch: int,
                  shot: int) -> EpisodeBatch:
        n = self.task_ctx_x.shape[0]
        if source == "refine_train":
            # each "task" = a resample of the frozen context set; the refine
            # step predicts from qry(==ctx) images and fits ctx labels
            idx = self.rng.randint(0, n, size=(tasks_per_batch, max(n, 1)))
            ctx_x = self.task_ctx_x[idx]
            ctx_y = self.task_ctx_y[idx]
            mask = np.ones((tasks_per_batch, ctx_x.shape[1]), bool)
            return dict(ctx_x=ctx_x, ctx_y=ctx_y, ctx_mask=mask,
                        qry_x=ctx_x.copy(), qry_y=ctx_y.copy())
        # validation/test: the frozen task's query set
        reps = (tasks_per_batch, *([1] * (self.task_qry_x.ndim)))
        ctx_x = np.tile(self.task_ctx_x[None], reps)
        ctx_y = np.tile(self.task_ctx_y[None],
                        (tasks_per_batch, 1, 1))
        mask = np.ones((tasks_per_batch, ctx_x.shape[1]), bool)
        qry_x = np.tile(self.task_qry_x[None], reps)
        qry_y = np.tile(self.task_qry_y[None], (tasks_per_batch, 1, 1))
        return dict(ctx_x=ctx_x, ctx_y=ctx_y, ctx_mask=mask,
                    qry_x=qry_x, qry_y=qry_y)

    def gen_bg(self, config, data: str = "all"):
        pass
