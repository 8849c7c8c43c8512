"""Pascal1D episodic sampler (pose regression, 128x128x1, no test split).

Loads the reference pickle layout (`dataset/pascal_1d.py:50-56`):
``train_data_ins.pkl`` / ``val_data_ins.pkl`` = (x [C, I, 128, 128, 1],
y [C, I, K]) with the label in the last column.

Semantics preserved: fixed shot == query count (:84-87); label x10 and TA
offset from {0, .25, .5, .75} mod 1 run on device (aug.pipeline; :123-135).
"""

from __future__ import annotations

import os
import pickle
from typing import List, Optional

import numpy as np

from wmfml_tpu.data.basedata import BaseData
from wmfml_tpu.data.episode import EpisodeBatch, make_episode


class Pascal1D(BaseData):
    raw_label_dim = 1
    task_name = "pascal_1d"

    def __init__(self, path: str, img_size, seed: int,
                 aug: Optional[List[str]] = None, max_ctx: int = 15,
                 query_num: Optional[int] = None):
        super().__init__(img_size, aug)
        self.num_classes = 1
        self.max_ctx = max_ctx
        self.query_num = query_num or max_ctx

        def load(name):
            with open(os.path.join(path, name), "rb") as f:
                x, y = pickle.load(f)
            return np.asarray(x), np.asarray(y)[:, :, -1, None].astype(np.float32)

        self.x_train, self.y_train = load("train_data_ins.pkl")
        self.x_val, self.y_val = load("val_data_ins.pkl")
        self.train_rng = np.random.RandomState(seed)
        self.val_rng = np.random.RandomState(seed)

    def reset_eval(self, source: str, seed: int = 42):
        if source == "validation":
            self.val_rng = np.random.RandomState(seed)

    def _split(self, source: str):
        if source == "train":
            return self.x_train, self.y_train, self.train_rng
        if source == "validation":
            return self.x_val, self.y_val, self.val_rng
        raise TypeError("pascal_1d has no test split")

    def get_batch_indices(self, source: str, tasks_per_batch: int, shot: int):
        """Index-only episode draw (device-resident gathering)."""
        x, y, rng = self._split(source)
        query = self.query_num
        cls_idx = rng.randint(0, x.shape[0], size=tasks_per_batch)
        take = np.stack([rng.choice(x.shape[1], size=shot + query,
                                    replace=False)
                         for _ in range(tasks_per_batch)])
        return cls_idx, take, shot

    def get_batch(self, source: str, tasks_per_batch: int,
                  shot: int) -> EpisodeBatch:
        x, y, rng = self._split(source)
        query = self.query_num
        n_cls, n_inst = x.shape[0], x.shape[1]

        cls_idx = rng.randint(0, n_cls, size=tasks_per_batch)
        ctx_x = np.empty((tasks_per_batch, shot, *self.img_size), x.dtype)
        qry_x = np.empty((tasks_per_batch, query, *self.img_size), x.dtype)
        ctx_y = np.empty((tasks_per_batch, shot, 1), np.float32)
        qry_y = np.empty((tasks_per_batch, query, 1), np.float32)
        for t, k in enumerate(cls_idx):
            ci, qi = self._split_support_query(rng, n_inst, shot, query)
            ctx_x[t] = x[k, ci]
            qry_x[t] = x[k, qi]
            ctx_y[t] = y[k, ci]
            qry_y[t] = y[k, qi]
        return make_episode(ctx_x, ctx_y, qry_x, qry_y,
                            max_ctx=self.max_ctx, shot=shot)
