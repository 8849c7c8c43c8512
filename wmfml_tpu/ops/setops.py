"""Masked set-aggregation ops.

The reference feeds ragged context sets (shot varies per batch) and aggregates
with mean/max/BaCO over the set axis. On TPU we pad every context set to
``max_ctx_num`` and carry a boolean mask, so each op here must reproduce the
ragged math exactly on the masked subset. This is the framework's one
deliberate semantic re-design (see SURVEY §7.1 move 1).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp


def masked_mean(x: jnp.ndarray, mask: Optional[jnp.ndarray],
                axis: int = 1) -> jnp.ndarray:
    """Mean over ``axis`` counting only mask==True rows. mask: x.shape[:-1]."""
    if mask is None:
        return jnp.mean(x, axis=axis)
    m = mask[..., None].astype(x.dtype)
    denom = jnp.maximum(jnp.sum(m, axis=axis), 1.0)
    return jnp.sum(x * m, axis=axis) / denom


def masked_max(x: jnp.ndarray, mask: Optional[jnp.ndarray],
               axis: int = 1) -> jnp.ndarray:
    """Max over ``axis`` on mask==True rows; 0 if the set is empty."""
    if mask is None:
        return jnp.max(x, axis=axis)
    m = mask[..., None]
    neg = jnp.finfo(x.dtype).min
    out = jnp.max(jnp.where(m, x, neg), axis=axis)
    any_valid = jnp.any(mask, axis=axis)[..., None]
    return jnp.where(any_valid, out, 0.0)


def baco(mu: jnp.ndarray, var: jnp.ndarray,
         mask: Optional[jnp.ndarray] = None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Bayesian context aggregation (precision-weighted posterior update).

    Matches the reference closed form (`networks/CondNeuralProcess.py:59-75`,
    `networks/CNPShapeNet1D.py:78-94`): prior z ~ N(0, I);
        sigma_z = 1 / (1 + sum_i 1/var_i)
        mu_z    = sigma_z * sum_i (mu_i / var_i)
    Padded rows contribute zero precision, reproducing ragged-set math.

    mu, var: [T, S, D]; mask: [T, S] or None. Returns ([T, D], [T, D]).
    """
    sigma_inv = 1.0 / var
    if mask is not None:
        sigma_inv = sigma_inv * mask[..., None].astype(mu.dtype)
    sigma_z = 1.0 / (1.0 + jnp.sum(sigma_inv, axis=1))
    mu_z = sigma_z * jnp.sum(sigma_inv * mu, axis=1)
    return mu_z, sigma_z
