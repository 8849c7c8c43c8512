"""Device-resident evaluation: index-only deterministic eval sweeps.

Training-time validation in the reference runs every ``val_freq`` (50!)
iterations, so at fused-training speeds host-streamed eval batches dominate
wall clock. Here the val/test splits live in HBM; the host generates only the
deterministic episode *indices* (same RNG stream as the host sampler — the
rng-42 protocol is bit-identical) and one jitted sweep evaluates all
``val_iters`` batches in a single dispatch.

Used by ModelTrainer.validate when the splits fit HBM, and by the evaluation
CLI's full loss-vs-ctx sweep (evaluator/model_evaluator.py:95-122): all
``max_ctx x val_iters`` batches of one split evaluate in a single dispatch,
with variable context counts realized as ctx masks over a padded gather
(static shapes, one compiled program). The mode='eval' all-view query
protocol (dataset/shapenet_3d.py:201-204) is index-native here: the query
index block is simply the full view permutation.
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

    def arrays(self):
        """Split tensors, passed to jitted sweeps as ARGUMENTS — closing over
        them would embed them as HLO constants, which lowers through a
        device->host fetch of the whole split (minutes over the axon tunnel)
        and bloats the compiled module."""
        return self.x, self.y

    def gather(self, cls, ctx_idx, qry_idx, mask=None, arrays=None):
        """Traceable: [T] groups + [T, S]/[T, Q] instance indices -> batch."""
        x, y = arrays if arrays is not None else (self.x, self.y)
        ctx_x = x[cls[:, None], ctx_idx]
        qry_x = x[cls[:, None], qry_idx]
        ctx_y = y[cls[:, None], ctx_idx] * self.label_scale
        qry_y = y[cls[:, None], qry_idx] * self.label_scale
        if mask is None:
            mask = jnp.ones(ctx_idx.shape, bool)
        return dict(ctx_x=ctx_x, ctx_y=ctx_y, ctx_mask=mask,
                    qry_x=qry_x, qry_y=qry_y)


def split_from_dataset(data, config, source: str,
                       query_all: bool = False) -> Optional[DeviceSplit]:
    """DeviceSplit for a val/test split, or None if unsupported/too big.

    query_all: the mode='eval' protocol — queries are ALL views of the item,
    so the split only needs max_ctx_num instances, not max_ctx + query.
    """
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
    need = (config.max_ctx_num if query_all
            else config.max_ctx_num + config.query_num)
    if x.shape[1] < need:
        return None
    return DeviceSplit(x, y, label_scale=scale)


def build_device_eval_sweep(model, config, split: DeviceSplit, mesh_ctx=None):
    """jitted sweep(state, cls [V,T], ctx_idx [V,T,S], qry_idx [V,T,Q], key)
    -> losses [V] (test-metric per batch)."""
    loss_func = LossFunc(config.loss_type, config.task)
    forward = make_forward(model, config, train=False)

    def sweep(state, arrays, cls, ctx_idx, qry_idx, keys):
        # keys [V, 2]: the HOST path's per-batch rng keys, passed verbatim so
        # stochastic models (BBB eval sampling) score identically on either
        # path — not just the same episode indices

        def one(_, inp):
            cls_b, ci, qi, k = inp
            batch = split.gather(cls_b, ci, qi, arrays=arrays)
            out, pbatch = forward(state.model_variables(), batch, k)
            loss = loss_func.calc_loss(out.mu.astype(jnp.float32), out.var,
                                       pbatch["qry_y"], test=True)
            return None, loss

        _, losses = jax.lax.scan(one, None, (cls, ctx_idx, qry_idx, keys))
        return losses

    if mesh_ctx is None:
        jitted = jax.jit(sweep)
    else:
        repl = mesh_ctx.replicated
        jitted = jax.jit(sweep, in_shardings=(repl,) * 6, out_shardings=repl)

    def call(state, cls, ctx_idx, qry_idx, keys):
        return jitted(state, split.arrays(), cls, ctx_idx, qry_idx, keys)

    return call


def build_device_eval_ctx_sweep(model, config, split: DeviceSplit,
                                mesh_ctx=None):
    """Full evaluation-CLI sweep as ONE dispatch.

    jitted sweep(state, cls [V,T], ctx_idx [V,T,S], shots [V], qry_idx
    [V,T,Q], key) -> losses [V] where V = max_ctx_num * val_iters batches and
    shots[v] drives the per-batch context mask (padded gather + mask == the
    reference's ragged context sets, identical math through the masked
    aggregators).
    """
    loss_func = LossFunc(config.loss_type, config.task)
    forward = make_forward(model, config, train=False)

    def sweep(state, arrays, cls, ctx_idx, shots, qry_idx, keys):
        # keys [V, 2]: host-path per-batch rng keys (see build_device_eval_sweep)
        s = ctx_idx.shape[-1]

        def one(_, inp):
            cls_b, ci, shot, qi, k = inp
            mask = jnp.broadcast_to(jnp.arange(s)[None, :] < shot, ci.shape)
            batch = split.gather(cls_b, ci, qi, mask=mask, arrays=arrays)
            out, pbatch = forward(state.model_variables(), batch, k)
            loss = loss_func.calc_loss(out.mu.astype(jnp.float32), out.var,
                                       pbatch["qry_y"], test=True)
            return None, loss

        _, losses = jax.lax.scan(one, None, (cls, ctx_idx, shots, qry_idx,
                                             keys))
        return losses

    if mesh_ctx is None:
        jitted = jax.jit(sweep)
    else:
        repl = mesh_ctx.replicated
        jitted = jax.jit(sweep, in_shardings=(repl,) * 7, out_shardings=repl)

    def call(state, cls, ctx_idx, shots, qry_idx, keys):
        return jitted(state, split.arrays(), cls, ctx_idx, shots, qry_idx,
                      keys)

    return call
