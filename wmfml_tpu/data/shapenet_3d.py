"""ShapeNet3D episodic sampler (quaternion pose, 64x64 RGBA).

Loads the reference pickle layout (`dataset/shapenet_3d.py:65-79`): per split
a dict {'images' [N, 64, 64, 4] float32 in [0,1], 'item_indices' [N],
'Q' [N, 4] xyzw quats canonicalized to q[1] >= 0}, 30 views per item.

Sampling semantics preserved:
  * train: random item, random view permutation, shot ~ U[1, max]
    (shapenet_3d.py:110,189-204);
  * validation/test: items visited in a per-split fixed permutation with a
    wrap-around counter, views permuted by the split RNG (:171-188);
    ``reset_eval`` reseeds to 42 and zeroes the counter
    (evaluator/model_evaluator.py:151-158);
  * mode='eval': query = all 30 views (:201-204); train mode: query =
    ``query_num`` of the remaining views (the reference takes *all* remaining,
    a shot-dependent — therefore unjittable — count; a fixed-size random
    subset is the same estimator. Deviation documented.)

Background compositing (gen_bg): alpha==1 marks background pixels
(shapenet_3d.py:238-239); ``gen_bg`` recomposites whole splits in place like
the reference but vectorized over the split instead of a per-item Python loop.
"""

from __future__ import annotations

import os
import pickle
import threading
from typing import List, Optional

import numpy as np

from wmfml_tpu.data.basedata import BaseData
from wmfml_tpu.data.episode import EpisodeBatch, make_episode


class ShapeNet3DData(BaseData):
    raw_label_dim = 4
    task_name = "shapenet_3d"

    def __init__(self, path: str, img_size, seed: int,
                 num_instances_per_item: int = 30,
                 aug: Optional[List[str]] = None, mode: str = "train",
                 max_ctx: int = 15, query_num: Optional[int] = None):
        super().__init__(img_size, aug)
        self.mode = mode
        self.instances_per_item = num_instances_per_item
        self.max_ctx = max_ctx
        self.query_num = (num_instances_per_item if mode == "eval"
                          else (query_num or 15))
        self.azimuth_only = "azimuth_only" in self.aug_list

        bg_path = os.path.join(path, "bg_images.npy")
        if not os.path.exists(bg_path):
            bg_path = os.path.join(os.path.dirname(path.rstrip("/")),
                                   "bg_images.npy")
        self.bg_imgs = np.load(bg_path).astype(np.float32)

        self.splits = {}
        # eval runs never touch the train split (the largest pickle by
        # far) — don't unpickle + argsort-copy + pin it for nothing
        split_names = ([("validation", "val"), ("test", "test")]
                       if mode == "eval"
                       else [("train", "train"), ("validation", "val"),
                             ("test", "test")])
        for split, name in split_names:
            with open(os.path.join(path, f"shapenet3d_azi180ele30_{name}.pkl"),
                      "rb") as f:
                d = pickle.load(f)
            images = np.ascontiguousarray(d["images"], dtype=np.float32)
            item_indices = np.asarray(d["item_indices"])
            q = np.asarray(d["Q"], np.float32)
            n_items = int(item_indices.max()) + 1
            if images.shape[0] != n_items * num_instances_per_item:
                raise ValueError(
                    f"{split} split: expected {n_items} items x "
                    f"{num_instances_per_item} views, got {images.shape[0]} "
                    "instances — non-uniform view counts are unsupported")
            # dense [items, views, ...] gather tables for O(1) episode assembly
            order = np.argsort(item_indices, kind="stable")
            images = images[order].reshape(
                n_items, num_instances_per_item, *images.shape[1:])
            q = q[order].reshape(n_items, num_instances_per_item, 4)
            self.splits[split] = dict(images=images, Q=q, n_items=n_items)

        self.train_rng = np.random.RandomState(seed)
        self.val_rng = np.random.RandomState(seed)
        self.test_rng = np.random.RandomState(seed)
        # backgrounds draw from their OWN stream: gen_bg used to consume
        # train_rng, perturbing the episode stream at bg_gen_freq points
        # and racing the prefetcher thread's get_batch on the same
        # (non-thread-safe) RandomState
        self.bg_rng = np.random.RandomState(seed + 7919)
        # gen_bg rewrites split images in place while the prefetcher reads
        # them — serialize the two (host-streaming path only; the device
        # sampler composites per batch on device)
        self._bg_lock = threading.Lock()
        self.counters = {"validation": 0, "test": 0}
        self.perms = {
            "validation": self.val_rng.permutation(self.splits["validation"]["n_items"]),
            "test": self.test_rng.permutation(self.splits["test"]["n_items"]),
        }

    # ------------------------------------------------------------------

    def reset_eval(self, source: str, seed: int = 42):
        rng = np.random.RandomState(seed)
        if source == "validation":
            self.val_rng = rng
        elif source == "test":
            self.test_rng = rng
        if source in self.counters:
            self.counters[source] = 0

    def _rng(self, source):
        return {"train": self.train_rng, "validation": self.val_rng,
                "test": self.test_rng}[source]

    def get_batch_indices(self, source: str, tasks_per_batch: int, shot: int):
        """Index-only episode draw (device-resident gathering)."""
        items, perm, shot = self._draw(source, tasks_per_batch, shot)
        return items, perm[:, :shot + self.query_num], shot

    def _draw(self, source: str, tasks_per_batch: int, shot: int):
        split = self.splits[source]
        rng = self._rng(source)
        if source == "train":
            shot = int(rng.randint(1, shot + 1))
        v = self.instances_per_item
        items = np.empty(tasks_per_batch, np.int64)
        perm = np.empty((tasks_per_batch, v), np.int64)
        for t in range(tasks_per_batch):
            if source == "train":
                items[t] = rng.randint(split["n_items"])
            else:
                if self.counters[source] >= split["n_items"]:
                    self.counters[source] = 0
                items[t] = self.perms[source][self.counters[source]]
                self.counters[source] += 1
            perm[t] = rng.permutation(v)
        return items, perm, shot

    def get_batch(self, source: str, tasks_per_batch: int,
                  shot: int) -> EpisodeBatch:
        split = self.splits[source]
        # the SAME draw as get_batch_indices — the host/device eval parity
        # invariant needs both paths to consume the RNG in lockstep
        items, perm, shot = self._draw(source, tasks_per_batch, shot)
        query = self.query_num

        from wmfml_tpu._native.bindings import assemble_episode

        # native multithreaded gather of the image rows (hot host path);
        # labels are tiny — numpy indexing. Lock out gen_bg's in-place
        # recompositing while we read.
        off = -1 if self.mode == "eval" else 0
        with self._bg_lock:
            ctx_x, qry_x = assemble_episode(split["images"], items, perm,
                                            shot, query, query_offset=off)
        quats = split["Q"][items[:, None], perm]       # [T, V, 4]
        ctx_y = quats[:, :shot]
        qry_y = quats if self.mode == "eval" else quats[:, shot:shot + query]
        return make_episode(ctx_x, ctx_y, qry_x, qry_y,
                            max_ctx=self.max_ctx, shot=shot)

    # ------------------------------------------------------------------

    def _composite_split(self, split_name: str, rng: np.random.RandomState):
        from wmfml_tpu._native.bindings import composite_backgrounds

        s = self.splits[split_name]
        imgs = s["images"]
        flat = imgs.reshape(-1, *imgs.shape[2:])
        bg_idx = rng.randint(0, self.bg_imgs.shape[0], size=flat.shape[0])
        with self._bg_lock:   # vs the prefetcher thread's get_batch read
            composite_backgrounds(flat, self.bg_imgs, bg_idx)

    def generate_and_save_data(self, out_path: str):
        """One-off builder: composite random backgrounds into every split and
        dump the reference pickle layout (dataset/shapenet_3d.py:269-283 —
        there it writes a hard-coded ./data path; here the destination is an
        argument)."""
        if "train" not in self.splits:
            raise RuntimeError("generate_and_save_data needs mode='train' "
                               "(eval mode skips loading the train split)")
        rng = self.bg_rng
        os.makedirs(out_path, exist_ok=True)
        for split, name in [("train", "train"), ("validation", "val"),
                            ("test", "test")]:
            self._composite_split(split, rng)
            s = self.splits[split]
            n_items, v = s["n_items"], self.instances_per_item
            flat = s["images"].reshape(n_items * v, *s["images"].shape[2:])
            item_indices = np.repeat(np.arange(n_items), v)
            q = s["Q"].reshape(n_items * v, 4)
            with open(os.path.join(
                    out_path, f"shapenet3d_azi180ele30_{name}.pkl"),
                    "wb") as f:
                pickle.dump({"images": flat, "item_indices": item_indices,
                             "Q": q}, f)

    def gen_bg(self, config, data: str = "all"):
        rng = self.bg_rng   # own stream: never perturbs the episode RNGs
        if data == "all":
            config.logger.info("=========== Generate BG for all data ============")
            for split in self.splits:
                self._composite_split(split, rng)
        elif data == "train":
            config.logger.info("====== Regenerate BG for Training Data ======")
            self._composite_split("train", rng)
        else:
            raise TypeError(
                "Wrong data type for generating random background, "
                "check gen_bg(data=**)!")
