"""ShapeNet1D episodic sampler (azimuth regression, 128x128x1).

Loads the reference pickle layout (`dataset/shapenet_1d.py:94-103`):
``train_data_{small,middle,large}.pkl`` / ``val_data.pkl`` / ``test_data.pkl``
each = (x [C, I, 128, 128, 1], y [C, I, K]) with the angle in the last label
column, scaled to [0, 1].

Sampling semantics preserved (`dataset/shapenet_1d.py:113-196`):
  * one class per task; ``shot + shot_max`` instances without replacement,
    first ``shot`` = support, next ``shot_max`` = query;
  * train-time shot uniform in [3, shot_max];
  * labels scaled x 2*pi.

TPU re-design: images stay uint8 on host ([T, N, H, W, C]); context is padded
to ``max_ctx`` with a boolean mask; normalization (/255), data augmentation,
task augmentation (per-task angle offset from linspace(0, 2, 16)[:-1], mod
2*pi — `dataset/shapenet_1d.py:180-187`) and the [cos, sin, raw] label
encoding all run on device inside the jitted step (wmfml_tpu.aug.pipeline).
"""

from __future__ import annotations

import os
import pickle
from typing import List, Optional

import numpy as np

from wmfml_tpu.data.basedata import BaseData
from wmfml_tpu.data.episode import EpisodeBatch, make_episode


class ShapeNet1D(BaseData):
    raw_label_dim = 1
    task_name = "shapenet_1d"

    def __init__(self, path: str, img_size, seed: int, data_size: str = "large",
                 aug: Optional[List[str]] = None, max_ctx: int = 15,
                 query_num: Optional[int] = None):
        super().__init__(img_size, aug)
        self.num_classes = 1
        self.data_size = data_size
        if max_ctx < 3:
            raise ValueError(
                f"shapenet_1d needs max_ctx_num >= 3 (train shot ~ U[3, "
                f"max], dataset/shapenet_1d.py:141-148); got {max_ctx}")
        self.max_ctx = max_ctx
        self.query_num = query_num or max_ctx

        def load(name):
            with open(os.path.join(path, name), "rb") as f:
                x, y = pickle.load(f)
            x = np.asarray(x)
            y = np.asarray(y)[:, :, -1, None].astype(np.float32)
            return x, y

        self.x_train, self.y_train = load(f"train_data_{data_size}.pkl")
        self.x_val, self.y_val = load("val_data.pkl")
        self.x_test, self.y_test = load("test_data.pkl")

        self.train_rng = np.random.RandomState(seed)
        self.val_rng = np.random.RandomState(seed)
        self.test_rng = np.random.RandomState(seed)

    def reset_eval(self, source: str, seed: int = 42):
        if source == "validation":
            self.val_rng = np.random.RandomState(seed)
        elif source == "test":
            self.test_rng = np.random.RandomState(seed)

    def _split(self, source: str):
        if source == "train":
            return self.x_train, self.y_train, self.train_rng
        if source == "validation":
            return self.x_val, self.y_val, self.val_rng
        if source == "test":
            return self.x_test, self.y_test, self.test_rng
        raise TypeError("no valid dataset type split!")

    def get_batch_indices(self, source: str, tasks_per_batch: int, shot: int):
        """Index-only episode draw (for device-resident gathering).

        Returns (cls [T], take [T, shot+query], shot) using the same RNG
        stream semantics as get_batch.
        """
        x, y, rng = self._split(source)
        shot_max = shot
        if source == "train":
            shot = int(rng.randint(3, shot_max + 1))
        query = self.query_num
        n_cls, n_inst = x.shape[0], x.shape[1]
        cls_idx = rng.randint(0, n_cls, size=tasks_per_batch)
        take = np.stack([rng.choice(n_inst, size=shot + query, replace=False)
                         for _ in range(tasks_per_batch)])
        return cls_idx, take, shot

    def get_batch(self, source: str, tasks_per_batch: int,
                  shot: int) -> EpisodeBatch:
        x, y, rng = self._split(source)
        shot_max = shot
        if source == "train":
            shot = int(rng.randint(3, shot_max + 1))
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

        ctx_y = ctx_y * (2.0 * np.pi)
        qry_y = qry_y * (2.0 * np.pi)
        return make_episode(ctx_x, ctx_y, qry_x, qry_y,
                            max_ctx=self.max_ctx, shot=shot)
