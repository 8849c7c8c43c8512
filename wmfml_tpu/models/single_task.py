"""Non-meta SingleTask baselines: predict from the query image alone.

Mirrors networks/SingleTaskShapeNet1D.py:70-90 (literature encoder ->
EncoderFC -> r_to_z -> decoder, context ignored) and
networks/SingleTaskShapeNet3D.py:54-73 (ResNet trunk -> task_encoder -> mu ->
NPDecoder on the same query features). SingleTaskDistractor in the reference
crashes on a dead import (networks/SingleTaskDistractor.py:24); here it is the
working ResNet-trunk variant the code intends.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from wmfml_tpu.models.base import ModelOutput
from wmfml_tpu.models.neural_process import NPDecoder, _flat_apply
from wmfml_tpu.nn.encoders import LiteratureEncoder, ResNetTrunk
from wmfml_tpu.nn.mlp import MLP, Dense, EncoderFC


class SingleTaskSmall(nn.Module):
    """SingleTaskShapeNet1D-style: literature trunk, no context."""

    dim_w: int = 64
    n_hidden_units_r: Sequence[int] = (100, 100)
    dim_r: int = 100
    dim_z: int = 64
    y_dim: int = 2
    tanh_out: bool = True
    dtype: Optional[jnp.dtype] = None
    pool_impl: str = "window"      # max-pool lowering (nn/encoders.py:max_pool2)
    stem_impl: str = "conv"        # "s2d" = phase-layout stem (encoders.py)

    @nn.compact
    def __call__(self, ctx_x, ctx_y, qry_x, ctx_mask=None, train: bool = False,
                 qry_y=None):
        del ctx_x, ctx_y, ctx_mask  # context is ignored by design
        x = _flat_apply(LiteratureEncoder(self.dim_w, dtype=self.dtype,
                                          pool_impl=self.pool_impl,
                                          stem_impl=self.stem_impl,
                                          name="encoder_w0"), qry_x)
        r = EncoderFC(self.n_hidden_units_r, self.dim_r, dtype=self.dtype,
                      name="encoder_r")(x)
        z = Dense(self.dim_z, dtype=self.dtype, name="r_to_z")(r)
        mu = MLP(hidden=(100, 100), out=self.y_dim,
                 final_activation="tanh" if self.tanh_out else None,
                 dtype=self.dtype, name="decoder0")(
            jnp.concatenate([x, z], axis=-1))
        return ModelOutput(mu=mu, var=None, kl=0.0, extras={})


class SingleTaskLarge(nn.Module):
    """SingleTaskShapeNet3D/Distractor-style: ResNet trunk, no context."""

    img_agg: str = "reshape"
    y_dim: int = 4
    h_dim: int = 256
    dtype: Optional[jnp.dtype] = None
    trunk_stem: str = "conv"       # "s2d" = phase-layout conv1+layer1

    @nn.compact
    def __call__(self, ctx_x, ctx_y, qry_x, ctx_mask=None, train: bool = False,
                 qry_y=None):
        del ctx_x, ctx_y, ctx_mask
        x = _flat_apply(ResNetTrunk(img_agg=self.img_agg, dtype=self.dtype,
                                    trunk_stem=self.trunk_stem,
                                    name="img_encoder"), qry_x)
        h = self.h_dim
        feats = MLP(hidden=(h, h), out=h, final_activation="relu",
                    dtype=self.dtype, name="task_encoder")(x)
        sample = Dense(h, dtype=self.dtype, name="mu")(feats)
        mu, var = NPDecoder(img_agg=self.img_agg, y_dim=self.y_dim,
                            dtype=self.dtype, trunk_stem=self.trunk_stem,
                            name="decoder")(qry_x, sample)
        return ModelOutput(mu=mu, var=var, kl=0.0, extras={})
