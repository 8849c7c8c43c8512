"""Model registry: reference method names -> TPU-native modules.

The reference dispatches dynamically by importing ``networks.<method>`` and
instantiating the class of the same name (train.py:41-44). Here every method
name maps to a builder over the unified module families, so all reference
YAMLs work verbatim while the implementation stays consolidated.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax.numpy as jnp

from wmfml_tpu.models.neural_process import LargeCNP, SmallCNP
from wmfml_tpu.models.single_task import SingleTaskLarge, SingleTaskSmall

_REGISTRY: Dict[str, Callable] = {}


def register(name: str):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn

    return deco


def available_methods():
    return sorted(_REGISTRY)


def build_model(config):
    """Instantiate the module for ``config.method`` (reference train.py:41-44)."""
    if config.method not in _REGISTRY:
        raise NameError(
            f"method {config.method!r} unknown; available: {available_methods()}")
    return _REGISTRY[config.method](config)


def _dtype(config):
    return jnp.bfloat16 if getattr(config, "compute_dtype", "float32") == "bfloat16" else None


# -- small (literature-encoder) family ---------------------------------------

def _small(config, agg_mode, tanh_out):
    return SmallCNP(
        dim_w=config.dim_w, n_hidden_units_r=tuple(config.n_hidden_units_r),
        dim_r=config.dim_r, dim_z=config.dim_z, y_dim=config.output_dim,
        agg_mode=agg_mode, tanh_out=tanh_out, dtype=_dtype(config))


@register("CNPShapeNet1D")
def _(config):
    return _small(config, config.agg_mode, tanh_out=True)


@register("ANPShapeNet1D")
def _(config):
    if config.agg_mode != "attention":
        raise TypeError("agg_mode is not applicable for ANP, choose from ['attention']")
    return _small(config, "attention", tanh_out=True)


@register("CNPVanillaPascal1D")
def _(config):
    return _small(config, config.agg_mode, tanh_out=False)


@register("ANPVanillaPascal1D")
def _(config):
    if config.agg_mode != "attention":
        raise TypeError("agg_mode is not applicable for ANP, choose from ['attention']")
    return _small(config, "attention", tanh_out=False)


# -- large (ResNet-trunk) family ----------------------------------------------

def _large(config, agg_mode, label_embed=None):
    return LargeCNP(
        img_agg=config.img_agg, agg_mode=agg_mode, y_dim=config.output_dim,
        label_embed_dim=label_embed, dtype=_dtype(config))


@register("CondNeuralProcess")
def _(config):
    return _large(config, config.agg_mode)


@register("ANP")
def _(config):
    return _large(config, "attention")


@register("CNPDistractor")
def _(config):
    return _large(config, config.agg_mode, label_embed=config.dim_w)


@register("ANPDistractor")
def _(config):
    return _large(config, "attention", label_embed=config.dim_w)


# -- SingleTask baselines -----------------------------------------------------

@register("SingleTaskShapeNet1D")
def _(config):
    return SingleTaskSmall(
        dim_w=config.dim_w, n_hidden_units_r=tuple(config.n_hidden_units_r),
        dim_r=config.dim_r, dim_z=config.dim_z, y_dim=config.output_dim,
        tanh_out=True, dtype=_dtype(config))


@register("SingleTaskShapeNet3D")
def _(config):
    return SingleTaskLarge(img_agg=config.img_agg, y_dim=config.output_dim,
                           dtype=_dtype(config))


@register("SingleTaskDistractor")
def _(config):
    return SingleTaskLarge(img_agg=config.img_agg, y_dim=config.output_dim,
                           dtype=_dtype(config))
