"""Episodic dataset base API.

Mirrors the reference surface (`dataset/basedata.py:20-44`): constructor takes
img dims + aug flags; ``get_batch(source, tasks_per_batch, shot)`` yields one
episode; ``gen_bg(config)`` regenerates backgrounds (ShapeNet3D only).

Differences by design:
  * ``get_batch`` returns a *host* EpisodeBatch dict (padded + masked, uint8
    images where possible); augmentation and label encoding happen on device
    inside the jitted step (see wmfml_tpu.aug), so samplers are pure index
    gathering — cheap enough to overlap fully with TPU compute.
  * deterministic eval streams: ``reset_eval(source)`` reseeds the split RNG
    (reference reseeds to 42 at every validation sweep —
    `evaluator/model_evaluator.py:151-158`).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from wmfml_tpu.data.episode import EpisodeBatch


class BaseData:
    # host-side raw label dimensionality (pre device-side encoding)
    raw_label_dim: int = 1

    def __init__(self, img_size, aug: Optional[List[str]] = None):
        self.img_size = list(img_size)
        self.image_height = img_size[0]
        self.image_width = img_size[1]
        self.image_channels = img_size[2]
        aug = aug or []
        allowed = {"MR", "data_aug", "task_aug", "azimuth_only"}
        assert set(aug).issubset(allowed), f"unknown aug in {aug}"
        self.aug_list = list(aug)
        self.data_aug = "data_aug" in self.aug_list
        self.task_aug = "task_aug" in self.aug_list

    # -- API ---------------------------------------------------------------

    def get_batch(self, source: str, tasks_per_batch: int,
                  shot: int) -> EpisodeBatch:
        raise NotImplementedError

    def gen_bg(self, config, data: str = "all"):
        """Regenerate split backgrounds (no-op except ShapeNet3D)."""

    def reset_eval(self, source: str, seed: int = 42):
        """Make the next eval sweep over ``source`` deterministic."""

    # -- helpers ------------------------------------------------------------

    @staticmethod
    def _split_support_query(rng: np.random.RandomState, n_instances: int,
                             shot: int, query: int, replace: bool = False):
        idx = rng.choice(n_instances, size=shot + query, replace=replace)
        return idx[:shot], idx[shot:]
