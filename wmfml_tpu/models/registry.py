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
        agg_mode=agg_mode, tanh_out=tanh_out,
        dtype=_dtype(config),
        pool_impl=getattr(config, "pool_impl", "window"),
        conv_bwd=getattr(config, "conv_bwd", "xla"),
        stem_impl=getattr(config, "stem_impl", "conv"))


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
        label_embed_dim=label_embed,
        dtype=_dtype(config),
        trunk_stem=getattr(config, "trunk_stem", "conv"))


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


# -- MR (Bayes-by-Backprop meta-regularization) variants ----------------------

def _small_mr(config, agg_mode, tanh_out):
    return SmallCNP(
        dim_w=config.dim_w, n_hidden_units_r=tuple(config.n_hidden_units_r),
        dim_r=config.dim_r, dim_z=config.dim_z, y_dim=config.output_dim,
        agg_mode=agg_mode, tanh_out=tanh_out, bbb_encoder=True,
        dtype=_dtype(config))


@register("CNPMR")
def _(config):
    # base CNPMR has no Tanh head; the ShapeNet1D subclass adds it
    return _small_mr(config, config.agg_mode, tanh_out=False)


@register("CNPMRShapeNet1D")
def _(config):
    return _small_mr(config, config.agg_mode, tanh_out=True)


@register("ANPMR")
def _(config):
    return _small_mr(config, "attention", tanh_out=False)


@register("ANPMRShapeNet1D")
def _(config):
    return _small_mr(config, "attention", tanh_out=True)


@register("ANPMRShapeNet3D")
def _(config):
    return LargeCNP(
        img_agg=config.img_agg, agg_mode="attention", y_dim=config.output_dim,
        bbb_trunk=True, dtype=_dtype(config))


# -- FCL (functional contrastive learning) variants ---------------------------

@register("FCLCNPShapeNet1D")
def _(config):
    return SmallCNP(
        dim_w=config.dim_w, n_hidden_units_r=tuple(config.n_hidden_units_r),
        dim_r=config.dim_r, dim_z=config.dim_z, y_dim=config.output_dim,
        agg_mode=config.agg_mode, tanh_out=True, fcl=True,
        dtype=_dtype(config))


@register("FCLCNPDistractor")
def _(config):
    return LargeCNP(
        img_agg=config.img_agg, agg_mode=config.agg_mode,
        y_dim=config.output_dim, label_embed_dim=config.dim_w, fcl=True,
        dtype=_dtype(config),
        trunk_stem=getattr(config, "trunk_stem", "conv"))


@register("FCLANP")
def _(config):
    return LargeCNP(
        img_agg=config.img_agg, agg_mode="attention", y_dim=config.output_dim,
        fcl=True, dtype=_dtype(config),
        trunk_stem=getattr(config, "trunk_stem", "conv"))


# -- MAML family ---------------------------------------------------------------

def _maml(config, tanh_out, bbb):
    from wmfml_tpu.models.maml import MAMLRegressor

    return MAMLRegressor(
        dim_w=config.dim_w, dim_hidden=config.dim_hidden or 64,
        output_dim=config.output_dim, tanh_out=tanh_out, bbb_encoder=bbb,
        dtype=_dtype(config),
        # separate knob from pool_impl: the global default ('window') is
        # measured-wrong inside the second-order inner loop
        pool_impl=getattr(config, "maml_pool_impl", "slice"),
        stem_impl=getattr(config, "stem_impl", "conv"))


@register("MAMLShapeNet1D")
def _(config):
    return _maml(config, tanh_out=True, bbb=False)


@register("VanillaMAML")
def _(config):
    return _maml(config, tanh_out=False, bbb=False)


@register("MAMLMR")
def _(config):
    return _maml(config, tanh_out=False, bbb=True)


@register("MAMLMRShapeNet1D")
def _(config):
    return _maml(config, tanh_out=True, bbb=True)


# -- MMAML ----------------------------------------------------------------------

@register("MMAMLShapeNet1D")
def _(config):
    from wmfml_tpu.models.mmaml_nets import ConvEmbeddingNet, GatedConvNet
    from wmfml_tpu.train.mmaml import MMAMLBundle

    # networks/MMAMLShapeNet1D.py:52-84: num_channels=32, affine FiLM
    # conditioning, embedding dims 2x the modulated channels
    return MMAMLBundle(
        gated=GatedConvNet(output_dim=config.output_dim, num_channels=32,
                           condition_type="affine", tanh_out=True,
                           dtype=_dtype(config)),
        embed=ConvEmbeddingNet(embedding_dims=(64, 128, 256, 512),
                               num_channels=32, hidden_size=128,
                               embedding_pooling="avg",
                               rnn_aggregation=bool(
                                   getattr(config, "rnn_aggregation", False)),
                               dtype=_dtype(config)))


# -- SingleTask baselines -----------------------------------------------------

@register("SingleTaskShapeNet1D")
def _(config):
    return SingleTaskSmall(
        dim_w=config.dim_w, n_hidden_units_r=tuple(config.n_hidden_units_r),
        dim_r=config.dim_r, dim_z=config.dim_z, y_dim=config.output_dim,
        tanh_out=True, dtype=_dtype(config),
        pool_impl=getattr(config, "pool_impl", "window"),
        stem_impl=getattr(config, "stem_impl", "conv"))


@register("SingleTaskShapeNet3D")
def _(config):
    return SingleTaskLarge(img_agg=config.img_agg, y_dim=config.output_dim,
                           trunk_stem=getattr(config, "trunk_stem", "conv"),
                           dtype=_dtype(config))


@register("SingleTaskDistractor")
def _(config):
    return SingleTaskLarge(img_agg=config.img_agg, y_dim=config.output_dim,
                           trunk_stem=getattr(config, "trunk_stem", "conv"),
                           dtype=_dtype(config))
