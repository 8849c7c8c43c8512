"""MMAML networks: modulated base learner + task embedding model.

``GatedConvNet`` — the base learner (networks/gated_conv_net.py:151-212,
use_max_pool=False branch): 4x [conv3x3 s2 (ch 32/64/128/256), batchnorm
(affine=False, batch statistics), conditional modulation, ReLU], spatial mean
pool, linear head, Tanh. Modulation types (:151-165): 'sigmoid_gate'
(x * sigmoid(e)), 'affine' (FiLM: x * (1 + gamma) + beta), 'softmax'.

``ConvEmbeddingNet`` — the task encoder (networks/conv_embedding_model.py:
99-184, convolutional+avgpool_after_conv+no-rnn configuration): 4x [conv3x3
s2, batchnorm, ReLU], spatial mean pool, linear->128+ReLU, avg-pool across
the task's (masked) instances, then one linear head per modulated layer
producing embedding dims [64, 128, 256, 512].

Both are per-task functions ([N, H, W, C] of ONE task); the trainer vmaps
them over the task axis.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from wmfml_tpu.models.maml import masked_batch_norm
from wmfml_tpu.nn.init import torch_bias_init, torch_kernel_init
from wmfml_tpu.nn.mlp import Dense


def _batch_stats_norm(x, mask, eps: float = 1e-5):
    """Normalize [N, H, W, C] by masked batch statistics (no affine);
    shares the single-pass implementation in models/maml.py."""
    return masked_batch_norm(x, mask, eps=eps)


class GatedConvNet(nn.Module):
    output_dim: int = 2
    num_channels: int = 32
    condition_type: str = "affine"   # sigmoid_gate | affine | softmax
    tanh_out: bool = True
    dtype: Optional[jnp.dtype] = None

    def _condition(self, x, e):
        if e is None:
            return x
        if self.condition_type == "sigmoid_gate":
            return x * jax.nn.sigmoid(e)[None, None, None, :x.shape[-1]]
        if self.condition_type == "affine":
            c = x.shape[-1]
            gammas, betas = e[:c], e[c:2 * c]
            return x * (1.0 + gammas)[None, None, None, :] + betas[None, None, None, :]
        if self.condition_type == "softmax":
            return x * jax.nn.softmax(e)[None, None, None, :x.shape[-1]]
        raise ValueError(f"Unrecognized conditional layer type "
                         f"{self.condition_type}")

    @nn.compact
    def __call__(self, x, embeddings=None, mask=None):
        """x [N, H, W, C] of one task; embeddings: list of 4 vectors or None."""
        ch = self.num_channels
        for i, c_out in enumerate([ch, ch * 2, ch * 4, ch * 8]):
            c_in = x.shape[-1]
            x = nn.Conv(c_out, (3, 3), strides=2, padding=[(1, 1), (1, 1)],
                        kernel_init=torch_kernel_init,
                        bias_init=torch_bias_init(c_in * 9),
                        dtype=self.dtype, name=f"layer{i + 1}_conv")(x)
            x = _batch_stats_norm(x, mask)
            e = embeddings[i] if embeddings is not None else None
            x = self._condition(x, e)
            x = nn.relu(x)
        x = jnp.mean(x, axis=(1, 2))                  # spatial average pool
        x = Dense(self.output_dim, dtype=self.dtype, name="classifier")(x)
        return jnp.tanh(x) if self.tanh_out else x


class _MaskedGRUCell(nn.Module):
    """GRUCell step that HOLDS its carry on masked (padded) steps.

    Scanning this over a padded sequence reproduces the reference's ragged
    GRU semantics exactly: padded steps are identity on the state, so the
    final carry equals the state after the last valid element."""

    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, carry, inp):
        x, m = inp                                  # x [1, F], m [1]
        cell = nn.GRUCell(features=self.features, dtype=self.dtype,
                          name="cell")
        new_carry, _ = cell(carry, x)
        carry = jnp.where((m > 0)[:, None], new_carry, carry)
        return carry, carry


class ConvEmbeddingNet(nn.Module):
    embedding_dims: Sequence[int] = (64, 128, 256, 512)
    num_channels: int = 32
    num_channels_max: int = 256
    hidden_size: int = 128
    embedding_pooling: str = "avg"   # avg | max
    # bidirectional-GRU aggregation over the task's instances — the
    # reference option at networks/conv_embedding_model.py:76-88,132-144
    # (rnn_aggregation; dead in the shipped config, MMAMLShapeNet1D.py:72)
    rnn_aggregation: bool = False
    num_layers: int = 2
    linear_before_rnn: bool = False
    dtype: Optional[jnp.dtype] = None

    def _gru_aggregate(self, x, mask):
        """Bidirectional ``num_layers``-layer GRU over the instance axis.

        x [N, F] -> [2*hidden]: torch nn.GRU semantics — layer l>0 consumes
        the concatenated fwd/bwd outputs of layer l-1; the readout is
        cat(fwd output at the last step, bwd output at step 0), i.e. the
        final carry of each direction (conv_embedding_model.py:139-144).
        """
        ScanCell = nn.scan(_MaskedGRUCell, variable_broadcast="params",
                           split_rngs={"params": False},
                           in_axes=0, out_axes=0)
        m = mask if mask is not None else jnp.ones((x.shape[0],), x.dtype)
        h = x
        finals = []
        for layer in range(self.num_layers):
            outs, finals = [], []
            for dname, rev in (("fwd", False), ("bwd", True)):
                cell = ScanCell(features=self.hidden_size, dtype=self.dtype,
                                name=f"gru_l{layer}_{dname}")
                seq = (h[::-1] if rev else h)[:, None, :]      # [N, 1, F]
                msk = (m[::-1] if rev else m)[:, None]         # [N, 1]
                carry0 = jnp.zeros((1, self.hidden_size), h.dtype)
                final, ys = cell(carry0, (seq, msk))
                ys = ys[:, 0]                                   # [N, H]
                outs.append(ys[::-1] if rev else ys)
                finals.append(final[0])
            h = jnp.concatenate(outs, axis=-1)                  # [N, 2H]
        return jnp.concatenate(finals, axis=-1)                 # [2H]

    @nn.compact
    def __call__(self, x, mask=None) -> Tuple:
        """x [N, H, W, C] of one task -> tuple of per-layer embeddings."""
        chans = [min(self.num_channels_max, self.num_channels * 2 ** i)
                 for i in range(4)]
        for i, c_out in enumerate(chans):
            c_in = x.shape[-1]
            x = nn.Conv(c_out, (3, 3), strides=2, padding=[(1, 1), (1, 1)],
                        kernel_init=torch_kernel_init,
                        bias_init=torch_bias_init(c_in * 9),
                        dtype=self.dtype, name=f"conv{i + 1}")(x)
            # reference BN here has affine params; batch statistics
            scale = self.param(f"bn{i + 1}_scale", nn.initializers.ones,
                               (c_out,))
            bias = self.param(f"bn{i + 1}_bias", nn.initializers.zeros,
                              (c_out,))
            x = (_batch_stats_norm(x, mask) * scale.astype(x.dtype)
                 + bias.astype(x.dtype))
            x = nn.relu(x)
        x = jnp.mean(x, axis=(1, 2))                  # [N, 256]
        if self.rnn_aggregation:
            h = x
            if self.linear_before_rnn:
                h = nn.relu(Dense(self.hidden_size, dtype=self.dtype,
                                  name="linear_pre_rnn")(h))
            pooled = self._gru_aggregate(h, mask)     # [2*hidden]
            return tuple(
                Dense(dim, dtype=self.dtype, name=f"embedding_{i}")(pooled)
                for i, dim in enumerate(self.embedding_dims))
        x = nn.relu(Dense(self.hidden_size, dtype=self.dtype,
                          name="linear")(x))          # [N, 128]
        if mask is not None:
            m = mask[:, None].astype(x.dtype)
            if self.embedding_pooling == "avg":
                pooled = jnp.sum(x * m, 0) / jnp.maximum(jnp.sum(m), 1.0)
            else:
                pooled = jnp.max(jnp.where(m > 0, x, -jnp.inf), 0)
        else:
            pooled = (jnp.mean(x, 0) if self.embedding_pooling == "avg"
                      else jnp.max(x, 0))
        return tuple(
            Dense(dim, dtype=self.dtype, name=f"embedding_{i}")(pooled)
            for i, dim in enumerate(self.embedding_dims))
