"""Device-resident evaluation: index-only deterministic eval sweeps.

Training-time validation in the reference runs every ``val_freq`` (50!)
iterations, so at fused-training speeds host-streamed eval batches dominate
wall clock. Here the val/test splits live in HBM; the host generates only the
deterministic episode *indices* (same RNG stream as the host sampler — the
rng-42 protocol is bit-identical) and one jitted sweep evaluates all
``val_iters`` batches in a single dispatch.

Used by ModelTrainer.validate when the splits fit HBM; the evaluation CLI
keeps the host path (it also needs mode='eval' all-view queries).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from wmfml_tpu.data.device_sampler import DEVICE_DATA_BYTES_LIMIT
from wmfml_tpu.losses import LossFunc
from wmfml_tpu.train.steps import make_forward


class DeviceSplit:
    def __init__(self, x: np.ndarray, y: np.ndarray, label_scale: float = 1.0):
        self.x = jax.device_put(x)
        self.y = jax.device_put(np.asarray(y, np.float32))
        self.label_scale = label_scale

    def gather(self, cls, ctx_idx, qry_idx):
        """Traceable: [T] groups + [T, S]/[T, Q] instance indices -> batch."""
        ctx_x = self.x[cls[:, None], ctx_idx]
        qry_x = self.x[cls[:, None], qry_idx]
        ctx_y = self.y[cls[:, None], ctx_idx] * self.label_scale
        qry_y = self.y[cls[:, None], qry_idx] * self.label_scale
        mask = jnp.ones(ctx_idx.shape, bool)
        return dict(ctx_x=ctx_x, ctx_y=ctx_y, ctx_mask=mask,
                    qry_x=qry_x, qry_y=qry_y)


def split_from_dataset(data, config, source: str) -> Optional[DeviceSplit]:
    """DeviceSplit for a val/test split, or None if unsupported/too big."""
    task = getattr(data, "task_name", None)
    try:
        if task == "shapenet_1d":
            x, y = ((data.x_val, data.y_val) if source == "validation"
                    else (data.x_test, data.y_test))
            scale = 2.0 * np.pi
        elif task == "pascal_1d":
            if source != "validation":
                return None
            x, y = data.x_val, data.y_val
            scale = 1.0
        elif task in ("shapenet_3d", "distractor"):
            split = data.splits[source]
            x = split["images"]
            y = split["Q"] if task == "shapenet_3d" else split["centers"]
            scale = 1.0
        else:
            return None
    except (AttributeError, KeyError):
        return None
    if x.nbytes > DEVICE_DATA_BYTES_LIMIT:
        return None
    if x.shape[1] < config.max_ctx_num + config.query_num:
        return None
    return DeviceSplit(x, y, label_scale=scale)


def build_device_eval_sweep(model, config, split: DeviceSplit, mesh_ctx=None):
    """jitted sweep(state, cls [V,T], ctx_idx [V,T,S], qry_idx [V,T,Q], key)
    -> losses [V] (test-metric per batch)."""
    loss_func = LossFunc(config.loss_type, config.task)
    forward = make_forward(model, config, train=False)

    def sweep(state, cls, ctx_idx, qry_idx, key):
        keys = jax.random.split(key, cls.shape[0])

        def one(_, inp):
            cls_b, ci, qi, k = inp
            batch = split.gather(cls_b, ci, qi)
            out, pbatch = forward(state.model_variables(), batch, k)
            loss = loss_func.calc_loss(out.mu.astype(jnp.float32), out.var,
                                       pbatch["qry_y"], test=True)
            return None, loss

        _, losses = jax.lax.scan(one, None, (cls, ctx_idx, qry_idx, keys))
        return losses

    if mesh_ctx is None:
        return jax.jit(sweep)
    repl = mesh_ctx.replicated
    return jax.jit(sweep, in_shardings=(repl, repl, repl, repl, repl),
                   out_shardings=repl)
