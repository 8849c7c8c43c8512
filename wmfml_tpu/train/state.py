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
    """
    name = config.optimizer.lower()
    lr = config.lr
    wd = config.weight_decay
    if name == "adam":
        if wd:
            return optax.adamw(lr, weight_decay=float(wd))
        return optax.adam(lr)
    if name == "sgd":
        return optax.sgd(lr)
    if name == "adamw":
        return optax.adamw(lr, weight_decay=float(wd) if wd else 1e-2)
    raise NameError(f"optimizer {config.optimizer!r} not supported")


def param_count(params) -> int:
    return sum(int(jnp.size(p)) for p in jax.tree_util.tree_leaves(params))
