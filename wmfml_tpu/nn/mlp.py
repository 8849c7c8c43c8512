"""MLP blocks (flax.linen)."""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from wmfml_tpu.nn.init import torch_bias_init, torch_kernel_init


class Dense(nn.Module):
    """nn.Dense with torch-default init statistics."""

    features: int
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        return nn.Dense(
            self.features,
            use_bias=self.use_bias,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(fan_in),
            dtype=self.dtype,
        )(x)


class MLP(nn.Module):
    """Dense -> ReLU stack with a linear head.

    hidden=[h0, h1], out=o  ==>  Dense(h0) ReLU Dense(h1) ReLU Dense(o).
    """

    hidden: Sequence[int]
    out: int
    final_activation: Optional[str] = None  # None | "tanh" | "relu"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        for h in self.hidden:
            x = Dense(h, dtype=self.dtype)(x)
            x = nn.relu(x)
        x = Dense(self.out, dtype=self.dtype)(x)
        if self.final_activation == "tanh":
            x = jnp.tanh(x)
        elif self.final_activation == "relu":
            x = nn.relu(x)
        return x


class EncoderFC(nn.Module):
    """Set-element encoder MLP: input -> hidden* -> dim_r.

    Equivalent of reference EncoderFC (`networks/models.py:27-60`): ReLU after
    every hidden layer, linear output.
    """

    n_hidden_units_r: Sequence[int]
    dim_r: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        return MLP(hidden=tuple(self.n_hidden_units_r), out=self.dim_r,
                   dtype=self.dtype)(x)
