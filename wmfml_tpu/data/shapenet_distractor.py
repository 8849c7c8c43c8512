"""Distractor episodic sampler (2-D object localization, 128x128x1).

Loads the reference per-category ``{categ}_multi.npy`` files
(`dataset/shapenet_distractor.py:121-139`): object lists of 36-view instance
tuples with [0]=image (float [0,1]), [2]=angle index, [3]=center; train split
= 10 categories shuffled then cut 80/20 train/val (:147-162); test = 2 held-out
categories. Images stored x255 uint8 (:313-315).

Semantics preserved:
  * train shot ~ U[1, max] (:197);
  * labels are raw pixel centers (no normalization);
  * test re-permutes item order and resets the counter on EVERY call — quirk
    of the reference (:203-207, SURVEY §8.12) — reproduced;
  * image inversion (255 - x) and DA/TA run on device
    (wmfml_tpu.aug.pipeline, :233-254 semantics).
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

from wmfml_tpu.data.basedata import BaseData
from wmfml_tpu.data.episode import EpisodeBatch, make_episode

TRAIN_CATEGORIES = [
    "02691156", "02828884", "02933112", "02958343", "02992529",
    "03001627", "03211117", "03636649", "03691459", "04379243",
]
TEST_CATEGORIES = ["04256520", "04530566"]


class ShapeNetDistractor(BaseData):
    raw_label_dim = 2
    task_name = "distractor"

    def __init__(self, path: str, img_size, seed: int,
                 num_instances_per_item: int = 36,
                 train_fraction: float = 0.8, val_fraction: float = 0.2,
                 aug: Optional[List[str]] = None, mode: str = "train",
                 load_test_categ_only: bool = False,
                 test_categ: Optional[List[str]] = None,
                 max_ctx: int = 15, query_num: Optional[int] = None):
        super().__init__(img_size, aug)
        self.mode = mode
        self.instances_per_item = num_instances_per_item
        self.max_ctx = max_ctx
        self.query_num = (num_instances_per_item if mode == "eval"
                          else (query_num or 18))

        test_categories = test_categ or TEST_CATEGORIES
        train_categories = [] if load_test_categ_only else TRAIN_CATEGORIES

        def load_categs(categs):
            parts = [np.load(os.path.join(path, f"{c}_multi.npy"),
                             allow_pickle=True) for c in categs]
            return np.concatenate(parts, axis=0) if parts else None

        data_train = load_categs(train_categories)
        data_test = load_categs(test_categories)
        if load_test_categ_only:
            data_train = data_test

        rng0 = np.random.RandomState(seed)
        idx = rng0.permutation(data_train.shape[0])
        data_train = data_train[idx]
        n_total = data_train.shape[0]
        n_train = int(train_fraction * n_total)
        n_val = int(val_fraction * n_total)

        self.splits = {
            "train": self._extract(data_train[:n_train]),
            "validation": self._extract(data_train[n_train:n_train + n_val]),
            "test": self._extract(data_test),
        }
        self.train_rng = np.random.RandomState(seed)
        self.val_rng = np.random.RandomState(seed)
        self.test_rng = np.random.RandomState(seed)
        self.counters = {"test": 0}

    def _extract(self, data):
        v = self.instances_per_item
        n_items = data.shape[0]
        images = np.zeros((n_items, v, *self.img_size), np.uint8)
        centers = np.zeros((n_items, v, 2), np.float32)
        for i, item in enumerate(data):
            if len(item) != v:   # loud, like shapenet_3d's view check —
                # silent zero-fill would feed black (0,0)-labeled images
                raise ValueError(
                    f"distractor item {i}: expected {v} instances, got "
                    f"{len(item)} — non-uniform view counts are unsupported")
            for m, inst in enumerate(item):
                img = np.asarray(inst[0], np.float32).reshape(self.img_size)
                images[i, m] = (img * 255).astype(np.uint8)
                centers[i, m] = np.asarray(inst[3], np.float32)
        return dict(images=images, centers=centers, n_items=n_items)

    # ------------------------------------------------------------------

    def reset_eval(self, source: str, seed: int = 42):
        if source == "validation":
            self.val_rng = np.random.RandomState(seed)
        elif source == "test":
            self.test_rng = np.random.RandomState(seed)
            self.counters["test"] = 0

    def _rng(self, source):
        return {"train": self.train_rng, "validation": self.val_rng,
                "test": self.test_rng}[source]

    def _draw(self, source: str, tasks_per_batch: int, shot: int):
        """The one RNG-consuming draw, shared by get_batch and
        get_batch_indices — host/device eval parity requires both paths to
        consume the stream in lockstep."""
        split = self.splits[source]
        rng = self._rng(source)
        if source == "train":
            shot = int(rng.randint(1, shot + 1))
        v = self.instances_per_item
        if source == "test":
            # reference quirk: re-permute and reset every call (:203-207)
            perm_items = rng.permutation(split["n_items"])
            self.counters["test"] = 0
        items = np.empty(tasks_per_batch, np.int64)
        perm = np.empty((tasks_per_batch, v), np.int64)
        for t in range(tasks_per_batch):
            if source == "test":
                if self.counters["test"] >= split["n_items"]:
                    self.counters["test"] = 0
                items[t] = perm_items[self.counters["test"]]
                self.counters["test"] += 1
            else:
                items[t] = rng.randint(split["n_items"])
            perm[t] = rng.permutation(v)
        return items, perm, shot

    def get_batch_indices(self, source: str, tasks_per_batch: int, shot: int):
        """Index-only episode draw (device-resident gathering); same RNG
        stream as get_batch."""
        items, perm, shot = self._draw(source, tasks_per_batch, shot)
        return items, perm[:, :shot + self.query_num], shot

    def get_batch(self, source: str, tasks_per_batch: int,
                  shot: int) -> EpisodeBatch:
        split = self.splits[source]
        items, perm, shot = self._draw(source, tasks_per_batch, shot)
        query = self.query_num

        from wmfml_tpu._native.bindings import assemble_episode

        off = -1 if self.mode == "eval" else 0
        ctx_x, qry_x = assemble_episode(split["images"], items, perm,
                                        shot, query, query_offset=off)
        cents = split["centers"][items[:, None], perm]
        ctx_y = cents[:, :shot]
        qry_y = cents if self.mode == "eval" else cents[:, shot:shot + query]
        return make_episode(ctx_x, ctx_y, qry_x, qry_y,
                            max_ctx=self.max_ctx, shot=shot)
