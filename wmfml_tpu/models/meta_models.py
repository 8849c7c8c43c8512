"""Generic torchmeta-style meta-models (reference networks/models.py:206-266).

``MetaConvModel`` — the classic 4-layer conv net (conv3x3 + batchnorm + ReLU
+ maxpool per block) + linear head; ``MetaMLPModel`` — an MLP with ReLU
hidden layers. Neither is used by the paper's main path (SURVEY §2.7) but
both ship with the reference; provided here in the same per-task functional
form as MAMLRegressor so they plug into MAMLTrainer directly.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from wmfml_tpu.models.maml import masked_batch_norm
from wmfml_tpu.nn.encoders import max_pool_2x2
from wmfml_tpu.nn.init import torch_bias_init, torch_kernel_init
from wmfml_tpu.nn.mlp import Dense


class MetaConvModel(nn.Module):
    out_features: int
    hidden_size: int = 64
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, mask=None):
        """x [N, H, W, C] of one task -> ([N, out], kl=0)."""
        for i in range(4):
            c_in = x.shape[-1]
            x = nn.Conv(self.hidden_size, (3, 3), strides=1,
                        padding=[(1, 1), (1, 1)],
                        kernel_init=torch_kernel_init,
                        bias_init=torch_bias_init(c_in * 9),
                        dtype=self.dtype, name=f"layer{i + 1}_conv")(x)
            scale = self.param(f"layer{i + 1}_bn_scale",
                               nn.initializers.ones, (self.hidden_size,))
            bias = self.param(f"layer{i + 1}_bn_bias",
                              nn.initializers.zeros, (self.hidden_size,))
            x = masked_batch_norm(x, mask, scale.astype(x.dtype),
                                  bias.astype(x.dtype))
            x = nn.relu(x)
            x = max_pool_2x2(x)
        x = x.reshape(x.shape[0], -1)
        out = Dense(self.out_features, dtype=self.dtype, name="classifier")(x)
        return out, 0.0

    def adaptable_param_filter(self):
        def adaptable(path):
            return "_bn_" not in path[0]
        return adaptable


class MetaMLPModel(nn.Module):
    out_features: int
    hidden_sizes: Sequence[int] = (64, 64)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, mask=None):
        x = x.reshape(x.shape[0], -1)
        for i, h in enumerate(self.hidden_sizes):
            x = Dense(h, dtype=self.dtype, name=f"layer{i + 1}")(x)
            x = nn.relu(x)
        out = Dense(self.out_features, dtype=self.dtype, name="classifier")(x)
        return out, 0.0

    def adaptable_param_filter(self):
        return lambda path: True
