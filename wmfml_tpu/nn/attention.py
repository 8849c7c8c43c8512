"""FAVOR+ (Performer) linear cross-attention, TPU-native.

The reference ports google-research's JAX Performer to torch
(`networks/fast_attention.py:17-19,71-99,151-156`). We implement the same
math directly in JAX:

  * positive softmax random features with orthogonal Gaussian projections,
  * non-causal linear attention: out = (q' (k'^T v)) / (q' sum(k')),

plus a TPU-first upgrade: context masking — padded context rows are zeroed
*after* featurization so variable-shot episodes share one compiled program.
(A fused Pallas kernel for the feature map + attention einsums was built,
benchmarked across an (N, d) grid, and removed: XLA's fused einsums win at
every size the kernel could compile — grid and write-up in RESULTS.md.)

Head layout follows the reference exactly: 8 heads each of FULL model width
(256), per-head q/k/v projections initialized N(0, d^-0.5), concat -> output
projection (`networks/ANP.py:56-98`).
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from wmfml_tpu.nn.init import attn_kernel_init, torch_bias_init


def gaussian_orthogonal_random_matrix(key, nb_rows: int, nb_columns: int,
                                      scaling: int = 0,
                                      dtype=jnp.float32) -> jnp.ndarray:
    """Stack of orthogonal blocks with re-randomized row norms (FAVOR+)."""
    nb_full_blocks = nb_rows // nb_columns
    keys = jax.random.split(key, nb_full_blocks + 2)
    blocks = []
    for i in range(nb_full_blocks):
        block = jax.random.normal(keys[i], (nb_columns, nb_columns), dtype)
        q, _ = jnp.linalg.qr(block)
        blocks.append(q.T)
    remaining = nb_rows - nb_full_blocks * nb_columns
    if remaining > 0:
        block = jax.random.normal(keys[-2], (nb_columns, nb_columns), dtype)
        q, _ = jnp.linalg.qr(block)
        blocks.append(q.T[:remaining])
    final = jnp.concatenate(blocks, axis=0)
    if scaling == 0:
        multiplier = jnp.linalg.norm(
            jax.random.normal(keys[-1], (nb_rows, nb_columns), dtype), axis=1)
    elif scaling == 1:
        multiplier = math.sqrt(float(nb_columns)) * jnp.ones((nb_rows,), dtype)
    else:
        raise ValueError(f"Invalid scaling {scaling}")
    return multiplier[:, None] * final


def softmax_kernel_features(data: jnp.ndarray, projection: jnp.ndarray,
                            is_query: bool, normalize_data: bool = True,
                            eps: float = 1e-4) -> jnp.ndarray:
    """Positive random features phi(x) approximating softmax attention.

    data: [..., N, d]; projection: [m, d]; returns [..., N, m].
    Matches the reference stabilization: queries subtract a per-row max,
    keys subtract the global max (`networks/fast_attention.py:91-97`).
    """
    d = data.shape[-1]
    data_normalizer = d ** -0.25 if normalize_data else 1.0
    ratio = projection.shape[0] ** -0.5
    data_dash = jnp.einsum("...id,jd->...ij", data_normalizer * data, projection)
    diag_data = jnp.sum(data**2, axis=-1, keepdims=True) / 2.0 * data_normalizer**2
    if is_query:
        stab = jnp.max(data_dash, axis=-1, keepdims=True)
    else:
        stab = jnp.max(data_dash)
    return ratio * (jnp.exp(data_dash - diag_data - stab) + eps)


def linear_attention(q_prime: jnp.ndarray, k_prime: jnp.ndarray,
                     v: jnp.ndarray) -> jnp.ndarray:
    """Non-causal linear attention over featurized q/k.

    q_prime [..., Nq, m], k_prime [..., Nk, m], v [..., Nk, e] -> [..., Nq, e].
    """
    k_cumsum = jnp.sum(k_prime, axis=-2)  # [..., m]
    d_inv = 1.0 / jnp.einsum("...nd,...d->...n", q_prime, k_cumsum)
    context = jnp.einsum("...nd,...ne->...de", k_prime, v)  # [..., m, e]
    return jnp.einsum("...de,...nd,...n->...ne", context, q_prime, d_inv)


def favor_attention(q, k, v, projection, mask: Optional[jnp.ndarray] = None):
    """FAVOR+ attention with optional key-side mask.

    q [..., Nq, d], k [..., Nk, d], v [..., Nk, e], mask [..., Nk] bool
    (True = real context element). Masked rows are removed exactly: their
    featurized keys are zeroed, so they contribute nothing to either the
    numerator (k'^T v) or the normalizer sum(k').
    """
    q_prime = softmax_kernel_features(q, projection, is_query=True)
    k_prime = softmax_kernel_features(k, projection, is_query=False)
    if mask is not None:
        k_prime = k_prime * mask[..., None].astype(k_prime.dtype)
    return linear_attention(q_prime, k_prime, v)


class FastAttention(nn.Module):
    """Module wrapper holding the (redrawable) random projection.

    nb_features defaults to dim_heads * ln(dim_heads) as in the reference
    (`networks/fast_attention.py:162`). The projection is a non-trainable
    variable in the "favor" collection; redraw it via ``redraw_projection``.
    """

    dim_heads: int
    nb_features: Optional[int] = None
    ortho_scaling: int = 0

    @property
    def num_features(self) -> int:
        return self.nb_features or int(self.dim_heads * math.log(self.dim_heads))

    @nn.compact
    def __call__(self, q, k, v, mask=None):
        projection = self.variable(
            "favor", "projection",
            lambda: gaussian_orthogonal_random_matrix(
                self.make_rng("params") if self.has_rng("params")
                else jax.random.PRNGKey(0),
                self.num_features, self.dim_heads, self.ortho_scaling),
        )
        return favor_attention(q, k, v, projection.value, mask)


def redraw_projection(key, variables, path=("favor",)):
    """Return variables with every FAVOR projection matrix redrawn.

    Mirrors `networks/fast_attention.py:181-185` (redraw_projection_matrix).
    """
    favor = variables.get("favor")
    if favor is None:
        return variables
    leaves, treedef = jax.tree_util.tree_flatten(favor)
    keys = jax.random.split(key, len(leaves))
    new_leaves = [
        gaussian_orthogonal_random_matrix(k, leaf.shape[0], leaf.shape[1])
        for k, leaf in zip(keys, leaves)
    ]
    new_favor = jax.tree_util.tree_unflatten(treedef, new_leaves)
    out = dict(variables)
    out["favor"] = new_favor
    return out


class MultiheadFavorCrossAttention(nn.Module):
    """Reference ANP attention block: 8 full-width heads + FAVOR+ core.

    k: context image features, v: context task features, q: query image
    features — all [T, N, h_dim]. Returns [T, Nq, h_dim].
    (`networks/ANP.py:56-98` semantics, vectorized over heads instead of a
    Python per-head ModuleList loop.)
    """

    h_dim: int = 256
    n_heads: int = 8
    nb_features: Optional[int] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, k, v, q, mask=None):
        def proj(name, x):
            # one dense with n_heads*h_dim outputs == n_heads parallel
            # AttnLinear layers; init matches N(0, h_dim^-0.5) per head.
            y = nn.Dense(self.n_heads * self.h_dim,
                         kernel_init=attn_kernel_init,
                         bias_init=torch_bias_init(x.shape[-1]),
                         dtype=self.dtype, name=name)(x)
            t, n = y.shape[0], y.shape[1]
            return y.reshape(t, n, self.n_heads, self.h_dim).transpose(0, 2, 1, 3)

        k_all = proj("W_k", k)  # [T, H, Nk, d]
        v_all = proj("W_v", v)
        q_all = proj("W_q", q)

        attn_mask = None if mask is None else mask[:, None, :]  # [T, 1, Nk]
        outs = FastAttention(dim_heads=self.h_dim, nb_features=self.nb_features,
                             name="favor")(q_all, k_all, v_all, attn_mask)
        # [T, H, Nq, d] -> [T, Nq, H*d]
        t, h, nq, d = outs.shape
        outs = outs.transpose(0, 2, 1, 3).reshape(t, nq, h * d)
        return nn.Dense(self.h_dim, kernel_init=attn_kernel_init,
                        bias_init=torch_bias_init(h * d), dtype=self.dtype,
                        name="W_out")(outs)
