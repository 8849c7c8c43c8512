"""Import reference PyTorch checkpoints into wmfml_tpu parameter trees.

The reference distributes pretrained ``.pt`` state_dicts (README.md:39-40).
Converting them needs three layout rules:

  * conv kernels:    torch OIHW -> flax HWIO            (transpose 2,3,1,0)
  * linear kernels:  torch [out, in] -> flax [in, out]  (transpose)
  * linear AFTER a flatten of conv features: torch flattens NCHW as (C, H, W)
    while this framework flattens NHWC as (H, W, C) — the linear's input dim
    must be permuted: weight [out, C*H*W] -> [out, C, H, W] ->
    [H, W, C, out] -> [(H*W*C), out].

Key maps cover the model families; torch tensors arrive as numpy arrays
(call ``state_dict_to_numpy`` on a loaded torch state_dict first).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np


def state_dict_to_numpy(state_dict) -> Dict[str, np.ndarray]:
    return {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                          else v) for k, v in state_dict.items()}


def conv_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def linear_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def linear_after_flatten(w: np.ndarray, chw: Tuple[int, int, int]) -> np.ndarray:
    c, h, ww = chw
    out = w.shape[0]
    return np.transpose(w.reshape(out, c, h, ww), (2, 3, 1, 0)).reshape(-1, out)


def permute_flat_inputs(w_t: np.ndarray, chw: Tuple[int, int, int]) -> np.ndarray:
    """torch Linear weight [out, in] whose FIRST C*H*W input columns consume
    a CHW-flattened feature map -> flax kernel [in, out] consuming the
    HWC-flattened map; trailing (non-spatial, e.g. label) inputs keep order."""
    c, h, ww = chw
    spatial = c * h * ww
    w_img = linear_after_flatten(w_t[:, :spatial], chw)
    if w_t.shape[1] == spatial:
        return w_img
    return np.concatenate([w_img, linear_kernel(w_t[:, spatial:])], axis=0)


def _set(tree: dict, path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


# ---------------------------------------------------------------------------
# building-block importers (emit (path, value) pairs into a params tree)
# ---------------------------------------------------------------------------

def _tup(dst):
    return dst if isinstance(dst, tuple) else (dst,)


def import_literature_encoder(sd, prefix: str, tree: dict, dst,
                              flatten_chw=(64, 8, 8)):
    """torch Sequential indices of the literature stack
    (networks/CNPShapeNet1D.py:46-56): 0/2 convs, 5 conv, 8 linear."""
    dst = _tup(dst)
    for idx, name in [("0", "conv0"), ("2", "conv1"), ("5", "conv2")]:
        _set(tree, dst + (name, "kernel"),
             conv_kernel(sd[f"{prefix}.{idx}.weight"]))
        _set(tree, dst + (name, "bias"), sd[f"{prefix}.{idx}.bias"])
    _set(tree, dst + ("fc", "Dense_0", "kernel"),
         linear_after_flatten(sd[f"{prefix}.8.weight"], flatten_chw))
    _set(tree, dst + ("fc", "Dense_0", "bias"), sd[f"{prefix}.8.bias"])


def import_dense(sd, prefix: str, tree: dict, path: Tuple[str, ...],
                 flatten_chw: Optional[Tuple[int, int, int]] = None):
    w = sd[f"{prefix}.weight"]
    kernel = (linear_after_flatten(w, flatten_chw) if flatten_chw
              else linear_kernel(w))
    _set(tree, path + ("kernel",), kernel)
    _set(tree, path + ("bias",), sd[f"{prefix}.bias"])


def import_mlp(sd, prefixes, tree: dict, dst,
               first_flatten_chw: Optional[Tuple[int, int, int]] = None):
    """Sequence of torch Linear prefixes -> MLP Dense_i children."""
    for i, p in enumerate(prefixes):
        import_dense(sd, p, tree, _tup(dst) + (f"Dense_{i}", "Dense_0"),
                     flatten_chw=first_flatten_chw if i == 0 else None)


def import_encoder_fc(sd, prefix: str, tree: dict, dst, n_hidden: int):
    """EncoderFC: Sequential of Linear/ReLU pairs (networks/models.py:27-60).
    torch indices 0, 2, 4, ... -> MLP_0/Dense_i."""
    idxs = [str(2 * i) for i in range(n_hidden + 1)]
    for i, idx in enumerate(idxs):
        import_dense(sd, f"{prefix}.{idx}", tree,
                     _tup(dst) + ("MLP_0", f"Dense_{i}", "Dense_0"))


def import_resnet_trunk(sd, conv1_prefix: str, resnet_prefix: str,
                        tree: dict, dst):
    """ImageEncoder/NPDecoder trunk (networks/models.py:63-117 +
    networks/ResNet.py:144-150): 5x5 conv + 4 single-BasicBlock stages."""
    dst = _tup(dst)
    _set(tree, dst + ("conv1", "kernel"), conv_kernel(sd[f"{conv1_prefix}.weight"]))
    _set(tree, dst + ("conv1", "bias"), sd[f"{conv1_prefix}.bias"])
    for i in range(1, 5):
        blk = f"{resnet_prefix}.layer{i}.0"
        _set(tree, dst + (f"layer{i}", "conv1", "kernel"),
             conv_kernel(sd[f"{blk}.conv1.weight"]))
        _set(tree, dst + (f"layer{i}", "conv2", "kernel"),
             conv_kernel(sd[f"{blk}.conv2.weight"]))
        _set(tree, dst + (f"layer{i}", "downsample", "kernel"),
             conv_kernel(sd[f"{blk}.downsample.0.weight"]))


def import_attention_block(sd, tree: dict, dst, n_heads: int = 8,
                           favor_tree: Optional[dict] = None,
                           kq_chw: Optional[Tuple[int, int, int]] = None):
    """Per-head AttnLinear lists -> stacked [in, H*d] dense kernels
    (networks/ANP.py:56-68 -> MultiheadFavorCrossAttention W_k/W_v/W_q/W_out).

    kq_chw: when the k/q inputs are CHW-flattened image-trunk features (the
    large-CNP family feeds the trunk output straight into W_k/W_q,
    networks/ANP.py:117-123), their input axes need the CHW->HWC permutation;
    W_v consumes task-encoder outputs (no spatial structure).

    When the state_dict carries the FAVOR projection buffer
    (attn.projection_matrix) and ``favor_tree`` is given, it is imported so
    converted models reproduce the torch attention outputs exactly."""
    dst = _tup(dst)
    for torch_name, ours in [("_W_k", "W_k"), ("_W_v", "W_v"), ("_W_q", "W_q")]:
        perm = kq_chw if ours in ("W_k", "W_q") else None
        ws = [permute_flat_inputs(sd[f"{torch_name}.{i}.linear.weight"], perm)
              if perm else linear_kernel(sd[f"{torch_name}.{i}.linear.weight"])
              for i in range(n_heads)]
        bs = [sd[f"{torch_name}.{i}.linear.bias"] for i in range(n_heads)]
        _set(tree, dst + (ours, "kernel"), np.concatenate(ws, axis=1))
        _set(tree, dst + (ours, "bias"), np.concatenate(bs, axis=0))
    # reference flattens heads DIM-major (outs.permute(0,2,3,1).view,
    # networks/ANP.py:95-96: input index = dim*H + head); this framework
    # concatenates HEAD-major (head*d + dim) -> permute W's input axis
    w = sd["_W.linear.weight"]                       # [out, H*d] dim-major
    d_out = w.shape[0]
    d = w.shape[1] // n_heads
    w_head_major = w.reshape(d_out, d, n_heads).transpose(0, 2, 1).reshape(
        d_out, n_heads * d)
    _set(tree, dst + ("W_out", "kernel"), linear_kernel(w_head_major))
    _set(tree, dst + ("W_out", "bias"), sd["_W.linear.bias"])
    if favor_tree is not None and "attn.projection_matrix" in sd:
        _set(favor_tree, dst + ("favor", "projection"),
             np.asarray(sd["attn.projection_matrix"], np.float32))


def import_bbb_conv(sd, prefix: str, tree: dict, dst):
    """BBBConv2d posterior params (networks/bbb/BBBConv.py): OIHW -> HWIO."""
    dst = _tup(dst)
    for p in ("W_mu", "W_rho"):
        _set(tree, dst + (p,), conv_kernel(sd[f"{prefix}.{p}"]))
    for p in ("bias_mu", "bias_rho"):
        if f"{prefix}.{p}" in sd:
            _set(tree, dst + (p,), sd[f"{prefix}.{p}"])


def import_bbb_linear(sd, prefix: str, tree: dict, dst,
                      flatten_chw: Optional[Tuple[int, int, int]] = None):
    """BBBLinear posterior params; optional CHW->HWC flatten permutation."""
    dst = _tup(dst)
    for p in ("W_mu", "W_rho"):
        w = sd[f"{prefix}.{p}"]
        _set(tree, dst + (p,),
             linear_after_flatten(w, flatten_chw) if flatten_chw
             else linear_kernel(w))
    for p in ("bias_mu", "bias_rho"):
        if f"{prefix}.{p}" in sd:
            _set(tree, dst + (p,), sd[f"{prefix}.{p}"])


def import_bbb_literature_encoder(sd, prefix: str, tree: dict, dst,
                                  flatten_chw=(64, 8, 8)):
    """BBBEncoder (networks/CNPMR.py:39-52): torch Sequential keys
    net.layer1/2/3.conv (BBB convs) + net.linear (BBBLinear)."""
    dst = _tup(dst)
    for layer, name in [("layer1", "conv0"), ("layer2", "conv1"),
                        ("layer3", "conv2")]:
        import_bbb_conv(sd, f"{prefix}.net.{layer}.conv", tree, dst + (name,))
    import_bbb_linear(sd, f"{prefix}.net.linear", tree, dst + ("fc",),
                      flatten_chw=flatten_chw)


def import_bbb_resnet_trunk(sd, prefix: str, tree: dict, dst):
    """ANPMRShapeNet3D's BBBEncoder (networks/ANPMRShapeNet3D.py:79-91):
    {prefix}.net.layer1.conv (5x5 s2) + net.layer{2..5} BasicBlocks whose
    conv1/conv2/downsample.0 are ALL biased 3x3 BBB convs (the reference's
    "conv1x1" receives kernel_size=3/padding=1 via **kwargs)."""
    dst = _tup(dst)
    import_bbb_conv(sd, f"{prefix}.net.layer1.conv", tree, dst + ("conv1",))
    for i in range(2, 6):
        blk = f"{prefix}.net.layer{i}"
        name = f"layer{i - 1}"
        import_bbb_conv(sd, f"{blk}.conv1", tree, dst + (f"{name}_conv1",))
        import_bbb_conv(sd, f"{blk}.conv2", tree, dst + (f"{name}_conv2",))
        import_bbb_conv(sd, f"{blk}.downsample.0", tree,
                        dst + (f"{name}_down",))


# ---------------------------------------------------------------------------
# model-level importers
# ---------------------------------------------------------------------------

def import_small_cnp(sd: Dict[str, np.ndarray], n_hidden: int = 2,
                     agg_mode: str = "max") -> dict:
    """CNPShapeNet1D / CNPVanillaPascal1D (+ANP variants) state_dict ->
    SmallCNP variables ({"params": ..., ["favor": ...]})."""
    tree: dict = {}
    favor: dict = {}
    import_literature_encoder(sd, "encoder_w0", tree, "encoder_w0")
    import_dense(sd, "transform_y", tree, ("transform_y", "Dense_0"))
    import_encoder_fc(sd, "encoder_r.layers", tree, "encoder_r", n_hidden)
    import_dense(sd, "r_to_z", tree, ("r_to_z", "Dense_0"))
    import_mlp(sd, ["decoder0.0", "decoder0.2", "decoder0.4"], tree,
               "decoder0")
    if agg_mode == "baco":
        import_dense(sd, "rs_to_mu", tree, ("rs_to_mu", "Dense_0"))
        import_dense(sd, "rs_to_var", tree, ("rs_to_var", "Dense_0"))
    if agg_mode == "attention":
        import_attention_block(sd, tree, "cross_attn", favor_tree=favor)
    out = {"params": tree}
    if favor:
        out["favor"] = favor
    return out


def trunk_chw(img_agg: str, img_hw: int) -> Optional[Tuple[int, int, int]]:
    """(C, h, w) of the trunk's pre-flatten feature map, or None when the
    pooling removes spatial structure (img_agg='mean')."""
    if img_agg == "reshape":
        hw = img_hw // 32
        return (64, hw, hw)
    if img_agg in ("max", "baco"):
        return (64, 2, 2)
    return None  # mean


def import_large_cnp(sd: Dict[str, np.ndarray], agg_mode: str = "max",
                     img_hw: int = 64, img_agg: str = "reshape",
                     label_embed: bool = False, bbb_trunk: bool = False) -> dict:
    """CondNeuralProcess / ANP / CNPDistractor / ANPDistractor /
    FCLCNPDistractor / FCLANP / SingleTaskShapeNet3D / SingleTaskDistractor /
    ANPMRShapeNet3D (bbb_trunk) -> LargeCNP/SingleTaskLarge variables.

    Every consumer of the trunk's flattened features needs the CHW->HWC
    input permutation: task_encoder.0, attention W_k/W_q (trunk feats are
    the keys/queries, networks/ANP.py:117-123), and decoder.fc_mu.0."""
    tree: dict = {}
    favor: dict = {}
    chw = trunk_chw(img_agg, img_hw)
    if bbb_trunk:
        import_bbb_resnet_trunk(sd, "img_encoder", tree, "img_encoder")
    else:
        import_resnet_trunk(sd, "img_encoder.conv1", "img_encoder.resnet",
                            tree, "img_encoder")
    if label_embed:
        import_dense(sd, "transform_y", tree, ("transform_y", "Dense_0"))
    # task_encoder.0's first trunk_dim inputs are CHW-flattened trunk feats
    w0 = sd["task_encoder.0.weight"]
    _set(tree, ("task_encoder", "Dense_0", "Dense_0", "kernel"),
         permute_flat_inputs(w0, chw) if chw else linear_kernel(w0))
    _set(tree, ("task_encoder", "Dense_0", "Dense_0", "bias"),
         sd["task_encoder.0.bias"])
    for i, p in enumerate(["task_encoder.2", "task_encoder.4"], start=1):
        import_dense(sd, p, tree, ("task_encoder", f"Dense_{i}", "Dense_0"))
    import_dense(sd, "mu", tree, ("mu", "Dense_0"))
    if agg_mode == "baco":
        import_dense(sd, "latent_mu", tree, ("latent_mu", "Dense_0"))
        import_dense(sd, "latent_var", tree, ("latent_var", "Dense_0"))
    if agg_mode == "attention":
        import_attention_block(sd, tree, "cross_attn", favor_tree=favor,
                               kq_chw=chw)
    # NPDecoder: trunk + fc_mu head; same flatten permutation on fc_mu.0
    import_resnet_trunk(sd, "decoder.conv1", "decoder.resnet", tree,
                        ("decoder", "trunk"))
    w0 = sd["decoder.fc_mu.0.weight"]
    if chw is not None:
        trunk_dim = int(np.prod(chw))
        w_first = np.concatenate(
            [linear_after_flatten(w0[:, :trunk_dim], chw),
             linear_kernel(w0[:, trunk_dim:])], axis=0)
    else:
        w_first = linear_kernel(w0)
    _set(tree, ("decoder", "fc_mu", "Dense_0", "Dense_0", "kernel"), w_first)
    _set(tree, ("decoder", "fc_mu", "Dense_0", "Dense_0", "bias"),
         sd["decoder.fc_mu.0.bias"])
    for i, p in enumerate(["decoder.fc_mu.2", "decoder.fc_mu.4"], start=1):
        import_dense(sd, p, tree, ("decoder", "fc_mu", f"Dense_{i}", "Dense_0"))
    out = {"params": tree}
    if favor:
        out["favor"] = favor
    return out


def import_single_task_small(sd: Dict[str, np.ndarray],
                             n_hidden: int = 2) -> dict:
    """SingleTaskShapeNet1D (networks/SingleTaskShapeNet1D.py:43-67):
    literature encoder + EncoderFC(dim_w) + r_to_z + decoder — no label
    embedding (context is ignored by design)."""
    tree: dict = {}
    import_literature_encoder(sd, "encoder_w0", tree, "encoder_w0")
    import_encoder_fc(sd, "encoder_r.layers", tree, "encoder_r", n_hidden)
    import_dense(sd, "r_to_z", tree, ("r_to_z", "Dense_0"))
    import_mlp(sd, ["decoder0.0", "decoder0.2", "decoder0.4"], tree,
               "decoder0")
    return {"params": tree}


def import_small_mr(sd: Dict[str, np.ndarray], n_hidden: int = 2,
                    agg_mode: str = "max") -> dict:
    """CNPMR / CNPMRShapeNet1D (+ANPMR variants): SmallCNP(bbb_encoder=True)."""
    tree: dict = {}
    favor: dict = {}
    import_bbb_literature_encoder(sd, "encoder_w0", tree, "encoder_w0")
    import_dense(sd, "transform_y", tree, ("transform_y", "Dense_0"))
    import_encoder_fc(sd, "encoder_r.layers", tree, "encoder_r", n_hidden)
    import_dense(sd, "r_to_z", tree, ("r_to_z", "Dense_0"))
    import_mlp(sd, ["decoder0.0", "decoder0.2", "decoder0.4"], tree,
               "decoder0")
    if agg_mode == "baco":
        import_dense(sd, "rs_to_mu", tree, ("rs_to_mu", "Dense_0"))
        import_dense(sd, "rs_to_var", tree, ("rs_to_var", "Dense_0"))
    if agg_mode == "attention":
        import_attention_block(sd, tree, "cross_attn", favor_tree=favor)
    out = {"params": tree}
    if favor:
        out["favor"] = favor
    return out


def import_maml(sd: Dict[str, np.ndarray],
                reg_prefix: str = "regressor.regressor") -> dict:
    """MAMLShapeNet1D / VanillaMAML -> MAMLRegressor params.

    torchmeta MetaSequential keys: encoder_w.layer{1,2,3}.conv + encoder_w
    .linear; features.layer{1..4}.{conv,norm}. MAMLShapeNet1D wraps the
    regressor in MetaSequential ('regressor.regressor',
    networks/MAMLShapeNet1D.py:111-113) while VanillaMAML's is a bare
    MetaLinear ('regressor', networks/VanillaMAML.py:94). The dim_w ->
    14x14x1 reshape boundary needs no permutation (C == 1)."""
    tree: dict = {}
    for layer, name in [("layer1", "conv0"), ("layer2", "conv1"),
                        ("layer3", "conv2")]:
        _set(tree, ("encoder_w", name, "kernel"),
             conv_kernel(sd[f"encoder_w.{layer}.conv.weight"]))
        _set(tree, ("encoder_w", name, "bias"),
             sd[f"encoder_w.{layer}.conv.bias"])
    import_dense(sd, "encoder_w.linear", tree,
                 ("encoder_w", "fc", "Dense_0"), flatten_chw=(64, 8, 8))
    for i in range(1, 5):
        _set(tree, (f"features_{i}_conv", "kernel"),
             conv_kernel(sd[f"features.layer{i}.conv.weight"]))
        _set(tree, (f"features_{i}_conv", "bias"),
             sd[f"features.layer{i}.conv.bias"])
        _set(tree, (f"features_{i}_bn_scale",),
             sd[f"features.layer{i}.norm.weight"])
        _set(tree, (f"features_{i}_bn_bias",),
             sd[f"features.layer{i}.norm.bias"])
    import_dense(sd, reg_prefix, tree, ("regressor", "Dense_0"))
    return {"params": tree}


def import_maml_mr(sd: Dict[str, np.ndarray], tanh: bool = False) -> dict:
    """MAMLMR / MAMLMRShapeNet1D (networks/MAMLMR.py:50-63,99-128):
    encoder_w is a BBBEncoder (plain nn.Sequential keys, frozen in the inner
    loop), features/regressor are torchmeta Meta modules. The tanh variant
    wraps the regressor in MetaSequential -> key 'regressor.linear'."""
    tree: dict = {}
    import_bbb_literature_encoder(sd, "encoder_w", tree, "encoder_w")
    for i in range(1, 5):
        _set(tree, (f"features_{i}_conv", "kernel"),
             conv_kernel(sd[f"features.layer{i}.conv.weight"]))
        _set(tree, (f"features_{i}_conv", "bias"),
             sd[f"features.layer{i}.conv.bias"])
        _set(tree, (f"features_{i}_bn_scale",),
             sd[f"features.layer{i}.norm.weight"])
        _set(tree, (f"features_{i}_bn_bias",),
             sd[f"features.layer{i}.norm.bias"])
    reg = "regressor.linear" if tanh else "regressor"
    import_dense(sd, reg, tree, ("regressor", "Dense_0"))
    return {"params": tree}


def import_mmaml(sd: Dict[str, np.ndarray], n_layers: int = 4) -> dict:
    """MMAMLShapeNet1D: {model: GatedConvModel, embedding: ConvEmbeddingModel}
    (networks/gated_conv_net.py / conv_embedding_model.py key layouts; the
    reference saves a combined dict — pass its 'model_state_dict' with keys
    prefixed 'model.' and 'embedding_model.' or the flat per-net dicts)."""
    gated: dict = {}
    for i in range(1, n_layers + 1):
        _set(gated, (f"layer{i}_conv", "kernel"),
             conv_kernel(sd[f"model.features.layer{i}_conv.weight"]))
        _set(gated, (f"layer{i}_conv", "bias"),
             sd[f"model.features.layer{i}_conv.bias"])
        # layerN_bn is affine=False: no learnable params to import
    import_dense(sd, "model.classifier.fully_connected", gated,
                 ("classifier", "Dense_0"))

    embed: dict = {}
    for i in range(1, n_layers + 1):
        _set(embed, (f"conv{i}", "kernel"),
             conv_kernel(sd[f"embedding_model.conv.conv{i}.weight"]))
        _set(embed, (f"conv{i}", "bias"),
             sd[f"embedding_model.conv.conv{i}.bias"])
        _set(embed, (f"bn{i}_scale",),
             sd[f"embedding_model.conv.bn{i}.weight"])
        _set(embed, (f"bn{i}_bias",),
             sd[f"embedding_model.conv.bn{i}.bias"])
    import_dense(sd, "embedding_model.linear", embed, ("linear", "Dense_0"))
    for i in range(n_layers):
        import_dense(sd, f"embedding_model._embeddings.{i}", embed,
                     (f"embedding_{i}", "Dense_0"))
    return {"params": {"model": gated, "embedding": embed}}


# Every registry method has an importer (reference networks/* x 24).
# FCL variants add NO parameters over their base models
# (networks/FCLCNPShapeNet1D.py:47-72, FCLCNPDistractor.py:43-60,
# FCLANP.py:44-70) — asserted by tests/test_state_dict_keys.py — so they
# alias the base importers.
MODEL_IMPORTERS = {
    "MAMLShapeNet1D": import_maml,
    "VanillaMAML": lambda sd, **kw: import_maml(
        sd, reg_prefix="regressor", **kw),
    "MAMLMR": import_maml_mr,
    "MAMLMRShapeNet1D": lambda sd, **kw: import_maml_mr(sd, tanh=True, **kw),
    "MMAMLShapeNet1D": import_mmaml,
    "CNPMR": import_small_mr,
    "CNPMRShapeNet1D": import_small_mr,
    "ANPMR": lambda sd, **kw: import_small_mr(sd, agg_mode="attention", **kw),
    "ANPMRShapeNet1D": lambda sd, **kw: import_small_mr(
        sd, agg_mode="attention", **kw),
    "ANPMRShapeNet3D": lambda sd, **kw: import_large_cnp(
        sd, agg_mode="attention", bbb_trunk=True,
        img_agg=kw.pop("img_agg", "reshape"), **kw),
    "CNPShapeNet1D": import_small_cnp,
    "ANPShapeNet1D": lambda sd, **kw: import_small_cnp(
        sd, agg_mode="attention", **kw),
    "CNPVanillaPascal1D": import_small_cnp,
    "ANPVanillaPascal1D": lambda sd, **kw: import_small_cnp(
        sd, agg_mode="attention", **kw),
    "FCLCNPShapeNet1D": import_small_cnp,
    "FCLCNPDistractor": lambda sd, **kw: import_large_cnp(
        sd, img_hw=128, img_agg=kw.pop("img_agg", "max"), label_embed=True,
        **kw),
    "FCLANP": lambda sd, **kw: import_large_cnp(
        sd, agg_mode="attention", img_agg=kw.pop("img_agg", "reshape"), **kw),
    "SingleTaskShapeNet1D": import_single_task_small,
    "SingleTaskShapeNet3D": lambda sd, **kw: import_large_cnp(
        sd, agg_mode="mean", img_hw=64,
        img_agg=kw.pop("img_agg", "reshape"), **kw),
    "SingleTaskDistractor": lambda sd, **kw: import_large_cnp(
        sd, agg_mode="mean", img_hw=128,
        img_agg=kw.pop("img_agg", "max"), **kw),
    "CondNeuralProcess": import_large_cnp,
    "ANP": lambda sd, **kw: import_large_cnp(sd, agg_mode="attention", **kw),
    "CNPDistractor": lambda sd, **kw: import_large_cnp(
        sd, img_hw=128, img_agg=kw.pop("img_agg", "max"), label_embed=True,
        **kw),
    "ANPDistractor": lambda sd, **kw: import_large_cnp(
        sd, agg_mode="attention", img_hw=128,
        img_agg=kw.pop("img_agg", "max"), label_embed=True, **kw),
}


def import_torch_checkpoint(method: str, sd_numpy: Dict[str, np.ndarray],
                            **kw) -> dict:
    if method not in MODEL_IMPORTERS:
        raise NotImplementedError(
            f"no torch importer for {method}; available: "
            f"{sorted(MODEL_IMPORTERS)}")
    return MODEL_IMPORTERS[method](sd_numpy, **kw)


# ---------------------------------------------------------------------------
# checkpoint= flag integration: reference .pt files load directly
# ---------------------------------------------------------------------------

def _config_importer_kwargs(config) -> dict:
    """Per-method importer kwargs derived from the run config (the lambdas
    in MODEL_IMPORTERS already pin family-specific choices like
    agg_mode='attention'; only pass what each accepts)."""
    m = config.method
    n_hidden = (len(config.n_hidden_units_r) if config.n_hidden_units_r
                else 2)
    img_agg = config.img_agg or None
    if m in ("CNPShapeNet1D", "CNPVanillaPascal1D", "FCLCNPShapeNet1D",
             "CNPMR", "CNPMRShapeNet1D"):
        return dict(n_hidden=n_hidden, agg_mode=config.agg_mode or "max")
    if m in ("ANPShapeNet1D", "ANPVanillaPascal1D", "ANPMR",
             "ANPMRShapeNet1D", "SingleTaskShapeNet1D"):
        return dict(n_hidden=n_hidden)
    if m == "CondNeuralProcess":
        return dict(agg_mode=config.agg_mode or "max",
                    img_agg=img_agg or "reshape")
    if m in ("ANP", "FCLANP", "ANPMRShapeNet3D", "SingleTaskShapeNet3D"):
        return dict(img_agg=img_agg or "reshape")
    if m in ("CNPDistractor", "FCLCNPDistractor"):
        return dict(agg_mode=config.agg_mode or "max",
                    img_agg=img_agg or "max")
    if m in ("ANPDistractor", "SingleTaskDistractor"):
        return dict(img_agg=img_agg or "max")
    return {}


# Pickle GLOBAL/STACK_GLOBAL symbols a legitimate reference checkpoint may
# reference (tensor rebuild machinery, storages, containers, and the couple
# of stdlib/torch types the reference MMAML combined dict drags in through
# optimizer state_dicts: trainer/meta_learner_reg.py:218-227). Anything
# outside this set — notably os.system / subprocess / builtins.eval style
# gadgets — aborts the load before a single object is constructed.
_PICKLE_GLOBAL_ALLOWLIST = {
    ("collections", "OrderedDict"),
    ("collections", "defaultdict"),
    ("builtins", "dict"),
    ("builtins", "list"),
    ("builtins", "set"),
    ("builtins", "int"),
    ("builtins", "float"),
    ("builtins", "complex"),
    ("builtins", "bytearray"),
    ("torch._utils", "_rebuild_tensor_v2"),
    ("torch._utils", "_rebuild_tensor"),
    ("torch._utils", "_rebuild_parameter"),
    ("torch._utils", "_rebuild_device_tensor_from_numpy"),
    ("torch.serialization", "_get_layout"),
    ("torch", "Size"),
    ("torch", "device"),
    ("torch", "dtype"),
    ("numpy.core.multiarray", "_reconstruct"),
    ("numpy.core.multiarray", "scalar"),
    ("numpy._core.multiarray", "_reconstruct"),
    ("numpy._core.multiarray", "scalar"),
    ("numpy", "ndarray"),
    ("numpy", "dtype"),
} | {("torch", f"{p}Storage") for p in (
    "Float", "Double", "Half", "BFloat16", "Long", "Int", "Short", "Char",
    "Byte", "Bool", "Untyped", "Typed", "_Untyped", "_Typed")} \
  | {("torch.storage", s) for s in ("TypedStorage", "UntypedStorage",
                                    "_TypedStorage", "_UntypedStorage")}


def _scan_pickle_globals(path: str):
    """Return the set of (module, name) GLOBAL references inside the pickle
    payload(s) of ``path`` WITHOUT constructing any object.

    Handles both the zip-archive torch format (data.pkl entries) and legacy
    bare-pickle files. Scanning uses pickletools.genops, which only parses
    opcodes — no code from the file runs."""
    import io
    import pickletools
    import zipfile

    def scan(stream):
        found, strstack = set(), []
        # opcodes that neither push nor pop the pickle stack — MEMOIZE/PUT
        # variants routinely sit between the two string pushes and the
        # STACK_GLOBAL that consumes them (protocol 4)
        neutral = {"MEMOIZE", "PUT", "BINPUT", "LONG_BINPUT", "FRAME",
                   "PROTO", "STOP"}
        for op, arg, _pos in pickletools.genops(stream):
            if op.name == "GLOBAL":
                mod, name = arg.split(" ", 1)
                found.add((mod, name))
            elif op.name in ("SHORT_BINUNICODE", "BINUNICODE",
                             "BINUNICODE8", "UNICODE"):
                strstack.append(arg)
            elif op.name == "STACK_GLOBAL":
                # consumes the two most recent string constants
                if len(strstack) >= 2:
                    found.add((strstack[-2], strstack[-1]))
                    strstack = strstack[:-2]
                else:
                    # can't resolve the operands — conservative: flag it
                    found.add(("<unresolved>",
                               strstack[-1] if strstack else "<unresolved>"))
                    strstack = []
            elif op.name not in neutral:
                strstack = []
        return found

    if zipfile.is_zipfile(path):
        found = set()
        with zipfile.ZipFile(path) as zf:
            for info in zf.infolist():
                if info.filename.endswith(".pkl"):
                    with zf.open(info) as f:
                        found |= scan(io.BytesIO(f.read()))
        return found
    with open(path, "rb") as f:
        data = f.read()
    # legacy torch format: several concatenated pickles; scan the first
    # (the magic/metadata) is cheap, but the payload pickle streams tensors
    # with raw storage interleaved that genops can't skip — scan what parses
    # and treat parse failure as "unknown global present".
    try:
        return scan(io.BytesIO(data))
    except Exception:
        return {("<unparseable>", "<unparseable>")}


def load_torch_variables(config, path: str) -> dict:
    """Load a reference .pt checkpoint into flax variables for config.method.

    Handles the MMAML combined dict (trainer/meta_learner_reg.py:218-227:
    {'model_state_dict', 'embedding_model_state_dict', 'optimizers'}) by
    re-prefixing the two sub-state-dicts."""
    import torch

    try:
        # tensors-only unpickling: refuses arbitrary objects, which is the
        # right default for user-supplied .pt paths
        raw = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        import logging

        # weights_only rejected the file (e.g. the reference MMAML combined
        # dict). Before the full unpickle, statically verify every GLOBAL
        # the pickle references against an allowlist of tensor/container
        # rebuild machinery — a crafted .pt fails here with the offending
        # symbols named, instead of executing them.
        offending = sorted(
            g for g in _scan_pickle_globals(path)
            if g not in _PICKLE_GLOBAL_ALLOWLIST)
        if offending:
            raise RuntimeError(
                f"refusing to unpickle {path}: weights_only torch.load "
                f"failed and the pickle references symbols outside the "
                f"tensor-checkpoint allowlist: {offending}. If you trust "
                f"this file, load it yourself with torch.load(..., "
                f"weights_only=False) and re-save a plain state_dict.")
        logging.getLogger("wmfml_tpu").warning(
            "weights_only torch.load failed for %s — pickle global scan "
            "found only allowlisted tensor/container symbols; proceeding "
            "with full unpickling (reference MMAML combined dicts need "
            "this: trainer/meta_learner_reg.py:218-227)", path)
        raw = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(raw, dict) and "model_state_dict" in raw:
        sd = {}
        for k, v in raw["model_state_dict"].items():
            sd[f"model.{k}"] = v
        for k, v in raw.get("embedding_model_state_dict", {}).items():
            sd[f"embedding_model.{k}"] = v
    elif isinstance(raw, dict) and "state_dict" in raw:
        sd = raw["state_dict"]
    else:
        sd = raw
    return import_torch_checkpoint(config.method, state_dict_to_numpy(sd),
                                   **_config_importer_kwargs(config))


def maybe_restore_torch(config, path: str, state):
    """If ``path`` is a torch checkpoint file, import it into ``state``
    (model weights + aux buffers; optimizer state stays fresh — the
    reference's .pt files carry only the model). Returns None otherwise."""
    if not (isinstance(path, str) and path.endswith((".pt", ".pth"))):
        return None
    variables = load_torch_variables(config, path)
    params = variables["params"]
    if (isinstance(state.params, dict)
            and set(state.params) == {"net", "step_size"}):
        # learn_step_size wraps the model tree; reference .pt files carry no
        # step sizes, so they start fresh at update_lr — say so out loud
        import logging

        logging.getLogger("wmfml_tpu").warning(
            "torch checkpoint carries no inner step sizes; "
            "learn_step_size starts fresh at update_lr=%s", config.update_lr)
        params = {"net": params, "step_size": state.params["step_size"]}
    extra = {k: v for k, v in variables.items() if k != "params"}
    return state.replace(params=params,
                         extra_vars={**state.extra_vars, **extra})
