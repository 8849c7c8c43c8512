"""Train state pytree + optimizer factory."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    extra_vars: Any        # non-trainable collections (FAVOR projections, ...)
    opt_state: Any

    @classmethod
    def create(cls, variables, tx):
        import numpy as np

        params = variables["params"]
        extra = {k: v for k, v in variables.items() if k != "params"}
        # jit the optimizer init and build the step counter host-side: every
        # EAGER jax op pays a remote per-op compile on the axon platform
        # (measured up to ~15 s per op under load)
        return cls(step=np.zeros((), np.int32), params=params,
                   extra_vars=extra, opt_state=jax.jit(tx.init)(params))

    def model_variables(self):
        return {"params": self.params, **self.extra_vars}


def build_optimizer(config) -> optax.GradientTransformation:
    """Optimizer from config (reference train.py:52-56 builds torch.optim.<name>).

    weight_decay in the reference YAMLs is False/absent; when a float is given
    we use decoupled AdamW semantics.

    ``flatten_opt`` (default OFF since round 4): wrap in optax.flatten — the
    update runs on ONE concatenated vector instead of per-tensor.
    Mathematically identical (Adam/SGD are elementwise); only the opt_state
    layout changes, so keep the setting stable across save/resume. Round-4
    xprof op attribution showed the flatten machinery itself was the single
    biggest op in the ANP headline step: the 1-D→2-D retiling reshape
    (optax _layouts.py) ran at 5 GB/s for 17.4% of device time, plus the
    grad concatenate — dropping it measured 2.213→1.888 ms/step (+17%) in a
    same-window A/B (RESULTS.md round-4 opt sweep; scripts/opt_sweep.py).
    """
    name = config.optimizer.lower()
    lr = config.lr
    wd = config.weight_decay
    if name == "adam":
        base = (optax.adamw(lr, weight_decay=float(wd)) if wd
                else optax.adam(lr))
    elif name == "sgd":
        base = optax.sgd(lr)
    elif name == "adamw":
        base = optax.adamw(lr, weight_decay=float(wd) if wd else 1e-2)
    else:
        raise NameError(f"optimizer {config.optimizer!r} not supported")
    if flatten_enabled(config):
        base = optax.flatten(base)
    return base


def flatten_enabled(config) -> bool:
    """Whether optax.flatten wraps the optimizer for this config.

    A flattened opt_state is ONE concatenated vector — it cannot follow
    per-parameter tensor-parallel shardings, so per-leaf state is kept
    whenever a model axis is active (dryrun: 79 model-sharded leaves vs
    27). Shared by build_optimizer and build_mmaml_optimizer so both
    honor the same guard.
    """
    model_parallel = bool(config.mesh_shape) and any(
        axis != "data" and int(size) > 1
        for axis, size in dict(config.mesh_shape or {}).items())
    return bool(getattr(config, "flatten_opt", False)) and not model_parallel


def param_count(params) -> int:
    return sum(int(jnp.size(p)) for p in jax.tree_util.tree_leaves(params))
