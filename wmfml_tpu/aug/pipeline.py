"""Device-side episode processing: normalize + DA + TA + label encoding.

One jittable function per (task, train/eval) that consumes the raw host
EpisodeBatch (uint8/raw labels) and produces the model-facing batch. Running
this *inside* the jitted train step keeps host->device transfers at uint8 and
eliminates the reference's per-iteration CPU augmentation stall.

Task augmentation (TA) parity:
  * shapenet_1d — per-task angle offset from linspace(0, 2, 16)[:-1], mod 2pi
                  (dataset/shapenet_1d.py:180-187); labels -> [cos, sin, raw]
  * shapenet_3d — per-task Euler noise ele ~ U{-5..9}, azi ~ U{-10..19}
                  composed onto quats (utils/utils.py:33-58); azimuth_only
                  zeroes ele
  * distractor  — per-(task, coord) integer shift from linspace(0, 16, 17)[:-1],
                  mod 128 (dataset/shapenet_distractor.py:249-255); images are
                  inverted 255-x before aug (:233-234)
  * pascal_1d   — per-task offset from {0, .25, .5, .75} mod 1, then x10
                  (dataset/pascal_1d.py:123-135)
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp

from wmfml_tpu.aug.image_aug import build_augmenter
from wmfml_tpu.utils.quaternion import task_augment_quat


def _to_float(x, dtype):
    if x.dtype == jnp.uint8:
        return x.astype(dtype) / 255.0
    return x.astype(dtype)


def build_episode_processor(task: str, aug_list, train: bool,
                            compute_dtype=jnp.float32,
                            azimuth_only: bool = False,
                            aug_random_order: bool = True) -> Callable:
    """Return ``process(key, batch) -> batch`` (jit-traceable)."""
    data_aug = train and ("data_aug" in aug_list)
    task_aug = train and ("task_aug" in aug_list)
    augment = (build_augmenter(task, random_order=aug_random_order)
               if data_aug else None)

    def augment_pair(key, cx, qx):
        """DA for ctx+qry: always two calls, like the reference's two
        generate() calls. (A single concatenated call was measured 0.6
        ms/step SLOWER — it serializes against the encoder's merged
        ctx+qry batch; RESULTS.md round 3 — and was reverted.)"""
        if not data_aug:
            return cx, qx
        k1, k2 = jax.random.split(key)
        return augment(k1, cx), augment(k2, qx)

    if task == "shapenet_1d":

        def process(key, batch) -> Dict:
            k_aug, k_ta = jax.random.split(key)
            ctx_x, qry_x = augment_pair(
                k_aug, _to_float(batch["ctx_x"], compute_dtype),
                _to_float(batch["qry_x"], compute_dtype))
            ctx_y, qry_y = batch["ctx_y"], batch["qry_y"]
            if task_aug:
                noise_vals = jnp.linspace(0.0, 2.0, 16)[:-1]
                idx = jax.random.randint(k_ta, (ctx_y.shape[0], 1, 1), 0, 15)
                noise = noise_vals[idx]
                two_pi = 2.0 * jnp.pi
                ctx_y = (ctx_y + noise) % two_pi
                qry_y = (qry_y + noise) % two_pi
            enc = lambda y: jnp.concatenate(  # noqa: E731
                [jnp.cos(y), jnp.sin(y), y], axis=-1)
            return dict(batch, ctx_x=ctx_x, qry_x=qry_x,
                        ctx_y=enc(ctx_y), qry_y=enc(qry_y))

    elif task == "shapenet_3d":

        def process(key, batch) -> Dict:
            k_aug, k_ele, k_azi = jax.random.split(key, 3)
            # strip alpha; images are stored float [0,1] RGBA
            ctx_x = _to_float(batch["ctx_x"], compute_dtype)[..., :3]
            qry_x = _to_float(batch["qry_x"], compute_dtype)[..., :3]
            ctx_x, qry_x = augment_pair(k_aug, ctx_x, qry_x)
            ctx_y, qry_y = batch["ctx_y"], batch["qry_y"]
            if task_aug:
                t = ctx_y.shape[0]
                azi = jax.random.randint(k_azi, (t,), -10, 20).astype(compute_dtype)
                if azimuth_only:
                    ele = jnp.zeros((t,), compute_dtype)
                else:
                    ele = jax.random.randint(k_ele, (t,), -5, 10).astype(compute_dtype)
                ctx_y = task_augment_quat(ctx_y, ele, azi)
                qry_y = task_augment_quat(qry_y, ele, azi)
            return dict(batch, ctx_x=ctx_x, qry_x=qry_x,
                        ctx_y=ctx_y, qry_y=qry_y)

    elif task == "distractor":

        def process(key, batch) -> Dict:
            k_aug, k_ta = jax.random.split(key)
            # invert before augmentation (255 - x on uint8 == 1 - x/255)
            ctx_x = 1.0 - _to_float(batch["ctx_x"], compute_dtype)
            qry_x = 1.0 - _to_float(batch["qry_x"], compute_dtype)
            ctx_x, qry_x = augment_pair(k_aug, ctx_x, qry_x)
            ctx_y, qry_y = batch["ctx_y"], batch["qry_y"]
            if task_aug:
                shift = jax.random.randint(
                    k_ta, (ctx_y.shape[0], 1, 2), 0, 16).astype(ctx_y.dtype)
                ctx_y = (ctx_y + shift) % 128.0
                qry_y = (qry_y + shift) % 128.0
            return dict(batch, ctx_x=ctx_x, qry_x=qry_x,
                        ctx_y=ctx_y, qry_y=qry_y)

    elif task == "pascal_1d":

        def process(key, batch) -> Dict:
            k_aug, k_ta = jax.random.split(key)
            ctx_x, qry_x = augment_pair(
                k_aug, _to_float(batch["ctx_x"], compute_dtype),
                _to_float(batch["qry_x"], compute_dtype))
            ctx_y, qry_y = batch["ctx_y"], batch["qry_y"]
            if task_aug:
                noise_vals = jnp.array([0.0, 0.25, 0.5, 0.75], ctx_y.dtype)
                idx = jax.random.randint(k_ta, (ctx_y.shape[0], 1, 1), 0, 4)
                noise = noise_vals[idx]
                ctx_y = (ctx_y + noise) % 1.0
                qry_y = (qry_y + noise) % 1.0
            return dict(batch, ctx_x=ctx_x, qry_x=qry_x,
                        ctx_y=ctx_y * 10.0, qry_y=qry_y * 10.0)

    else:
        raise TypeError(f"unknown task {task!r}")

    return process
