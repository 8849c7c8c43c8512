"""CNP/ANP model family: shapes, mask correctness, zero-context gating."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wmfml_tpu.configs import Config
from wmfml_tpu.models.registry import available_methods, build_model

BASE = dict(
    checkpoint="", loss_type="mse", tasks_per_batch=2, max_ctx_num=5,
    noise_scale=0.0, lr=1e-4, weight_decay=False, optimizer="Adam",
    bg_gen_freq=100, val_iters=1, val_freq=10, iterations=5, device="cpu",
    seed=0, aug_list=[], query_num=4,
    dim_w=64, n_hidden_units_r=[100, 100], dim_r=64, dim_z=64,
)


def make_cfg(**kw):
    # img_size: tests-only override of the task-derived image shape —
    # equivalence/consistency properties hold at any size, and CPU conv
    # cost scales ~quadratically with H*W (quick-tier budget, VERDICT r4 #6)
    img_size = kw.pop("img_size", None)
    d = dict(BASE)
    d.update(kw)
    cfg = Config.from_dict(d)
    if img_size is not None:
        cfg.img_size = list(img_size)
    return cfg


def shrink_images(data, cfg, stride=4):
    """Strided-subsample a loaded dataset's images to match a shrunken
    cfg.img_size (tests only; keeps labels/RNG streams untouched)."""
    for attr in ("x_train", "x_val", "x_test"):
        x = getattr(data, attr, None)
        if x is not None:
            setattr(data, attr,
                    np.ascontiguousarray(x[:, :, ::stride, ::stride]))
    h, w, c = cfg.img_size
    cfg.img_size = [h // stride, w // stride, c]
    data.img_size = cfg.img_size
    return data


def episode(cfg, channels=None, label_dim=None, seed=0):
    rng = np.random.RandomState(seed)
    h, w, c = cfg.img_size
    c = channels or c
    t, s, q = cfg.tasks_per_batch, cfg.max_ctx_num, cfg.query_num
    dy = label_dim or cfg.input_dim
    return dict(
        ctx_x=rng.rand(t, s, h, w, c).astype(np.float32),
        ctx_y=rng.rand(t, s, dy).astype(np.float32),
        ctx_mask=np.ones((t, s), bool),
        qry_x=rng.rand(t, q, h, w, c).astype(np.float32),
        qry_y=rng.rand(t, q, dy).astype(np.float32),
    )


def init_and_apply(model, b, train=False):
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
            "bbb": jax.random.PRNGKey(2)}
    variables = model.init(rngs, b["ctx_x"], b["ctx_y"], b["qry_x"],
                           ctx_mask=b["ctx_mask"], train=train,
                           qry_y=b["qry_y"])
    out = model.apply(variables, b["ctx_x"], b["ctx_y"], b["qry_x"],
                      ctx_mask=b["ctx_mask"], train=train, qry_y=b["qry_y"],
                      rngs={"dropout": jax.random.PRNGKey(3),
                            "bbb": jax.random.PRNGKey(4)})
    return variables, out


@pytest.mark.parametrize("method,task,agg,extra", [
    ("CNPShapeNet1D", "shapenet_1d", "mean", {}),
    ("CNPShapeNet1D", "shapenet_1d", "max", {}),
    ("CNPShapeNet1D", "shapenet_1d", "baco", {}),
    ("ANPShapeNet1D", "shapenet_1d", "attention", {}),
    ("CNPVanillaPascal1D", "pascal_1d", "max", {}),
    ("ANPVanillaPascal1D", "pascal_1d", "attention", {}),
    ("SingleTaskShapeNet1D", "shapenet_1d", None, {}),
])
def test_small_family_shapes(method, task, agg, extra):
    cfg = make_cfg(method=method, task=task, agg_mode=agg, **extra)
    model = build_model(cfg)
    b = episode(cfg)
    _, out = init_and_apply(model, b)
    assert out.mu.shape == (cfg.tasks_per_batch, cfg.query_num, cfg.output_dim)
    assert np.all(np.isfinite(np.asarray(out.mu)))


@pytest.mark.parametrize("method,task,img_agg,agg", [
    ("CondNeuralProcess", "shapenet_3d", "reshape", "mean"),
    ("CondNeuralProcess", "shapenet_3d", "reshape", "baco"),
    ("ANP", "shapenet_3d", "reshape", "attention"),
    ("CNPDistractor", "distractor", "max", "max"),
    ("ANPDistractor", "distractor", "max", "attention"),
    ("SingleTaskShapeNet3D", "shapenet_3d", "reshape", None),
    ("SingleTaskDistractor", "distractor", "max", None),
])
def test_large_family_shapes(method, task, img_agg, agg):
    cfg = make_cfg(method=method, task=task, img_agg=img_agg, agg_mode=agg,
                   dim_w=16)
    model = build_model(cfg)
    channels = 3 if task == "shapenet_3d" else 1
    b = episode(cfg, channels=channels)
    _, out = init_and_apply(model, b)
    assert out.mu.shape == (cfg.tasks_per_batch, cfg.query_num, cfg.output_dim)
    assert np.all(np.isfinite(np.asarray(out.mu)))


@pytest.mark.parametrize("agg", ["mean", "max", "baco", "attention"])
def test_mask_removes_padding_influence(agg):
    """Garbage in padded context rows must not change predictions."""
    method = "ANPShapeNet1D" if agg == "attention" else "CNPShapeNet1D"
    cfg = make_cfg(method=method, task="shapenet_1d", agg_mode=agg)
    model = build_model(cfg)
    b = episode(cfg)
    b["ctx_mask"][:, 3:] = False

    variables, out1 = init_and_apply(model, b)
    b2 = dict(b)
    b2["ctx_x"] = b["ctx_x"].copy()
    b2["ctx_y"] = b["ctx_y"].copy()
    b2["ctx_x"][:, 3:] = 123.0   # garbage in masked rows
    b2["ctx_y"][:, 3:] = -55.0
    out2 = model.apply(variables, b2["ctx_x"], b2["ctx_y"], b2["qry_x"],
                       ctx_mask=b2["ctx_mask"], train=False,
                       rngs={"dropout": jax.random.PRNGKey(3),
                             "bbb": jax.random.PRNGKey(4)})
    np.testing.assert_allclose(np.asarray(out1.mu), np.asarray(out2.mu),
                               rtol=2e-4, atol=2e-5)


def test_zero_context_gates_latent():
    """All-masked context -> same output as the reference's z=0 branch."""
    cfg = make_cfg(method="CNPShapeNet1D", task="shapenet_1d", agg_mode="max")
    model = build_model(cfg)
    b = episode(cfg)
    b["ctx_mask"][:] = False
    variables, out1 = init_and_apply(model, b)
    b2 = dict(b)
    b2["ctx_x"] = b["ctx_x"] * 0 + 7.0
    out2 = model.apply(variables, b2["ctx_x"], b2["ctx_y"], b2["qry_x"],
                       ctx_mask=b2["ctx_mask"], train=False)
    np.testing.assert_allclose(np.asarray(out1.mu), np.asarray(out2.mu),
                               rtol=1e-5, atol=1e-6)


def test_registry_rejects_unknown():
    with pytest.raises(NameError):
        build_model(make_cfg(method="NoSuchModel", task="shapenet_1d"))
    assert "CNPShapeNet1D" in available_methods()


def test_bottleneck_block_construction():
    """networks/ResNet.py:77-119 Bottleneck (reachable from no shipped
    config; ported for surface parity): 1x1->3x3->1x1, expansion 4, live
    batchnorms, strided downsample on the identity path."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from wmfml_tpu.nn.encoders import Bottleneck

    blk = Bottleneck(planes=16, stride=2)
    x = jnp.asarray(np.random.RandomState(1).rand(4, 16, 16, 8), jnp.float32)
    variables = blk.init(jax.random.PRNGKey(0), x)
    out = blk.apply(variables, x)
    assert out.shape == (4, 8, 8, 64)  # expansion 4, stride 2
    assert bool(jnp.isfinite(out).all())
    names = set(variables["params"].keys())
    assert {"conv1", "conv2", "conv3", "downsample"} <= names


def test_load_pretrained_resnet_maps_and_reports():
    """networks/ResNet.py:171-185 pretrained-URL load: the reference's own
    branch strict-loads resnet18 keys into its modified net (crashes); our
    hook copies whatever is compatible from a local state_dict and reports
    the rest."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from wmfml_tpu.nn.encoders import ResNetTrunk, load_pretrained_resnet

    trunk = ResNetTrunk(img_agg="max")
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    variables = trunk.init(jax.random.PRNGKey(0), x)
    marker = np.full((64, 64, 3, 3), 7.0, np.float32)  # OIHW
    sd = {
        "layer1.0.conv1.weight": marker,
        "fc.weight": np.zeros((1000, 512), np.float32),  # incompatible
    }
    new_vars, skipped = load_pretrained_resnet(variables, sd)
    got = np.asarray(new_vars["params"]["layer1"]["conv1"]["kernel"])
    assert got.shape == (3, 3, 64, 64) and (got == 7.0).all()
    assert skipped == ["fc.weight"]
