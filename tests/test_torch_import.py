"""Checkpoint fidelity: torch reference architecture -> imported params ->
identical forward outputs.

The torch models here are written from the architecture spec (SURVEY §2.7/2.8)
to generate state_dicts with the reference's exact key names and layouts; the
converter must make our flax models reproduce their forward bit-for-bit
(up to float32 accumulation order)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

import jax  # noqa: E402

from wmfml_tpu.ckpt.torch_import import (  # noqa: E402
    import_torch_checkpoint,
    state_dict_to_numpy,
)
from wmfml_tpu.models.neural_process import LargeCNP, SmallCNP  # noqa: E402


class TorchSmallCNP(tnn.Module):
    """Reference CNPShapeNet1D architecture (max aggregation)."""

    def __init__(self, dim_w=64, dim_r=100, dim_z=64, label_dim=3, y_dim=2):
        super().__init__()
        self.dim_w = dim_w
        self.encoder_w0 = tnn.Sequential(
            tnn.Conv2d(1, 32, 3, 2, 1), tnn.ReLU(),
            tnn.Conv2d(32, 48, 3, 2, 1), tnn.ReLU(), tnn.MaxPool2d((2, 2)),
            tnn.Conv2d(48, 64, 3, 2, 1), tnn.ReLU(), tnn.Flatten(),
            tnn.Linear(4096, dim_w))
        self.transform_y = tnn.Linear(label_dim, dim_w // 4)
        self.encoder_r = tnn.Module()
        self.encoder_r.layers = tnn.Sequential(
            tnn.Linear(dim_w + dim_w // 4, 100), tnn.ReLU(),
            tnn.Linear(100, 100), tnn.ReLU(), tnn.Linear(100, dim_r))
        self.r_to_z = tnn.Linear(dim_r, dim_z)
        self.decoder0 = tnn.Sequential(
            tnn.Linear(dim_w + dim_z, 100), tnn.ReLU(),
            tnn.Linear(100, 100), tnn.ReLU(), tnn.Linear(100, y_dim),
            tnn.Tanh())

    def forward(self, ctx_x, ctx_y, qry_x):
        t, s = ctx_x.shape[:2]
        q = qry_x.shape[1]
        x_ctx = self.encoder_w0(ctx_x.reshape(t * s, *ctx_x.shape[2:]))
        x_ctx = x_ctx.reshape(t, s, self.dim_w)
        rs = self.encoder_r.layers(
            torch.cat([x_ctx, self.transform_y(ctx_y)], -1))
        r = torch.max(rs, dim=1)[0]
        z = self.r_to_z(r)[:, None, :].repeat(1, q, 1)
        x_qry = self.encoder_w0(qry_x.reshape(t * q, *qry_x.shape[2:]))
        x_qry = x_qry.reshape(t, q, self.dim_w)
        return self.decoder0(torch.cat([x_qry, z], -1))


def _torch_basic_block(c=64):
    blk = tnn.Module()
    blk.conv1 = tnn.Conv2d(c, c, 3, 2, 1, bias=False)
    blk.conv2 = tnn.Conv2d(c, c, 3, 1, 1, bias=False)
    blk.downsample = tnn.Sequential(tnn.Conv2d(c, c, 1, 2, bias=False))
    return blk


def _run_block(blk, x):
    out = tF.relu(blk.conv1(x))
    out = blk.conv2(out)
    return tF.relu(out + blk.downsample(x))


class TorchTrunk(tnn.Module):
    """Reference ImageEncoder trunk, img_agg='reshape'."""

    def __init__(self, in_ch=3):
        super().__init__()
        self.conv1 = tnn.Conv2d(in_ch, 64, 5, 2, 2)
        self.resnet = tnn.Module()
        for i in range(1, 5):
            setattr(self.resnet, f"layer{i}",
                    tnn.Sequential(_torch_basic_block()))

    def forward(self, x):
        x = tF.relu(self.conv1(x))
        for i in range(1, 5):
            x = _run_block(getattr(self.resnet, f"layer{i}")[0], x)
        return x.reshape(x.size(0), -1)  # 'reshape' aggregation


class TorchLargeCNP(tnn.Module):
    """Reference CondNeuralProcess (max aggregation, img_agg='reshape')."""

    def __init__(self, label_dim=4, y_dim=4):
        super().__init__()
        self.img_encoder = TorchTrunk()
        self.task_encoder = tnn.Sequential(
            tnn.Linear(256 + label_dim, 256), tnn.ReLU(),
            tnn.Linear(256, 256), tnn.ReLU(), tnn.Linear(256, 256), tnn.ReLU())
        self.mu = tnn.Linear(256, 256)
        self.decoder = tnn.Module()
        dec_trunk = TorchTrunk()
        self.decoder.conv1 = dec_trunk.conv1
        self.decoder.resnet = dec_trunk.resnet
        self._dec_trunk = dec_trunk
        self.decoder.fc_mu = tnn.Sequential(
            tnn.Linear(512, 256), tnn.ReLU(), tnn.Linear(256, 256),
            tnn.ReLU(), tnn.Linear(256, y_dim))

    def forward(self, ctx_x, ctx_y, qry_x):
        t, s = ctx_x.shape[:2]
        q = qry_x.shape[1]
        x_ctx = self.img_encoder(ctx_x.reshape(t * s, *ctx_x.shape[2:]))
        x_ctx = x_ctx.reshape(t, s, -1)
        feats = self.task_encoder(torch.cat([x_ctx, ctx_y], -1))
        agg = torch.max(feats, dim=1)[0]
        sample = self.mu(agg)[:, None, :].repeat(1, q, 1)
        x_qry = self._dec_trunk(qry_x.reshape(t * q, *qry_x.shape[2:]))
        x_qry = x_qry.reshape(t, q, -1)
        return self.decoder.fc_mu(torch.cat([x_qry, sample], -1))


rng = np.random.RandomState(5)


def test_small_cnp_forward_fidelity():
    tmodel = TorchSmallCNP().eval()
    ctx_x = rng.rand(2, 3, 1, 128, 128).astype(np.float32)
    ctx_y = rng.rand(2, 3, 3).astype(np.float32)
    qry_x = rng.rand(2, 2, 1, 128, 128).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(ctx_x), torch.from_numpy(ctx_y),
                      torch.from_numpy(qry_x)).numpy()

    variables = import_torch_checkpoint(
        "CNPShapeNet1D", state_dict_to_numpy(tmodel.state_dict()))
    model = SmallCNP(dim_w=64, dim_r=100, dim_z=64, y_dim=2, agg_mode="max")
    got = model.apply(
        variables,
        np.transpose(ctx_x, (0, 1, 3, 4, 2)), ctx_y,
        np.transpose(qry_x, (0, 1, 3, 4, 2)),
        ctx_mask=np.ones((2, 3), bool))
    np.testing.assert_allclose(np.asarray(got.mu), want, rtol=1e-4, atol=1e-5)


def test_large_cnp_forward_fidelity():
    tmodel = TorchLargeCNP().eval()
    ctx_x = rng.rand(2, 3, 3, 64, 64).astype(np.float32)
    quats = rng.rand(2, 3, 4).astype(np.float32)
    qry_x = rng.rand(2, 2, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(ctx_x), torch.from_numpy(quats),
                      torch.from_numpy(qry_x)).numpy()

    variables = import_torch_checkpoint(
        "CondNeuralProcess", state_dict_to_numpy(tmodel.state_dict()))
    model = LargeCNP(img_agg="reshape", agg_mode="max", y_dim=4)
    got = model.apply(
        variables,
        np.transpose(ctx_x, (0, 1, 3, 4, 2)), quats,
        np.transpose(qry_x, (0, 1, 3, 4, 2)),
        ctx_mask=np.ones((2, 3), bool))
    np.testing.assert_allclose(np.asarray(got.mu), want, rtol=2e-4, atol=2e-4)


class TorchFavorAttention(tnn.Module):
    """FAVOR+ math in torch, written from the formulas (fixed projection)."""

    def __init__(self, dim_heads, nb_features):
        super().__init__()
        self.register_buffer(
            "projection_matrix",
            torch.randn(nb_features, dim_heads) / (dim_heads ** 0.25))

    def _features(self, data, is_query):
        d = data.shape[-1]
        normalizer = d ** -0.25
        ratio = self.projection_matrix.shape[0] ** -0.5
        dash = torch.einsum("...id,jd->...ij", data * normalizer,
                            self.projection_matrix)
        diag = (data ** 2).sum(-1, keepdim=True) / 2.0 * normalizer ** 2
        if is_query:
            stab = dash.max(-1, keepdim=True).values
        else:
            stab = dash.max()
        return ratio * (torch.exp(dash - diag - stab) + 1e-4)

    def forward(self, q, k, v):
        qp = self._features(q, True)
        kp = self._features(k, False)
        k_sum = kp.sum(dim=-2)
        d_inv = 1.0 / torch.einsum("...nd,...d->...n", qp, k_sum)
        context = torch.einsum("...nd,...ne->...de", kp, v)
        return torch.einsum("...de,...nd,...n->...ne", context, qp, d_inv)


class TorchANPSmall(TorchSmallCNP):
    """Reference ANPShapeNet1D: SmallCNP + 8-head FAVOR cross attention."""

    def __init__(self, dim_w=64, dim_r=64, dim_z=64, n_heads=8):
        super().__init__(dim_w=dim_w, dim_r=dim_r, dim_z=dim_z)
        import math

        self.n_heads = n_heads
        def head():
            lin = tnn.Module()
            lin.linear = tnn.Linear(dim_w, dim_w)
            return lin
        self._W_k = tnn.ModuleList([head() for _ in range(n_heads)])
        self._W_v = tnn.ModuleList([head() for _ in range(n_heads)])
        self._W_q = tnn.ModuleList([head() for _ in range(n_heads)])
        self._W = tnn.Module()
        self._W.linear = tnn.Linear(n_heads * dim_w, dim_w)
        self.attn = TorchFavorAttention(dim_w, int(dim_w * math.log(dim_w)))

    def forward(self, ctx_x, ctx_y, qry_x):
        t, s = ctx_x.shape[:2]
        q = qry_x.shape[1]
        x_ctx = self.encoder_w0(ctx_x.reshape(t * s, *ctx_x.shape[2:]))
        x_ctx = x_ctx.reshape(t, s, self.dim_w)
        x_qry = self.encoder_w0(qry_x.reshape(t * q, *qry_x.shape[2:]))
        x_qry = x_qry.reshape(t, q, self.dim_w)
        rs = self.encoder_r.layers(
            torch.cat([x_ctx, self.transform_y(ctx_y)], -1))
        ks = torch.stack([m.linear(x_ctx) for m in self._W_k], 1)
        vs = torch.stack([m.linear(rs) for m in self._W_v], 1)
        qs = torch.stack([m.linear(x_qry) for m in self._W_q], 1)
        outs = self.attn(qs, ks, vs)                 # [T, H, Q, d]
        outs = outs.permute(0, 2, 3, 1).reshape(t, q, -1)
        z = self.r_to_z(self._W.linear(outs))
        return self.decoder0(torch.cat([x_qry, z], -1))


def test_anp_small_forward_fidelity_with_projection():
    torch.manual_seed(0)
    tmodel = TorchANPSmall().eval()
    ctx_x = rng.rand(2, 3, 1, 128, 128).astype(np.float32)
    ctx_y = rng.rand(2, 3, 3).astype(np.float32)
    qry_x = rng.rand(2, 2, 1, 128, 128).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(ctx_x), torch.from_numpy(ctx_y),
                      torch.from_numpy(qry_x)).numpy()

    variables = import_torch_checkpoint(
        "ANPShapeNet1D", state_dict_to_numpy(tmodel.state_dict()))
    assert "favor" in variables  # projection buffer imported
    model = SmallCNP(dim_w=64, dim_r=64, dim_z=64, y_dim=2,
                     agg_mode="attention")
    got = model.apply(
        variables,
        np.transpose(ctx_x, (0, 1, 3, 4, 2)), ctx_y,
        np.transpose(qry_x, (0, 1, 3, 4, 2)),
        ctx_mask=np.ones((2, 3), bool))
    np.testing.assert_allclose(np.asarray(got.mu), want, rtol=2e-3, atol=2e-4)


class TorchBBBConv(tnn.Module):
    def __init__(self, cin, cout, k, stride, pad):
        super().__init__()
        self.W_mu = tnn.Parameter(torch.randn(cout, cin, k, k) * 0.1)
        self.W_rho = tnn.Parameter(torch.full((cout, cin, k, k), -30.0))
        self.bias_mu = tnn.Parameter(torch.randn(cout) * 0.1)
        self.bias_rho = tnn.Parameter(torch.full((cout,), -30.0))
        self.stride, self.pad = stride, pad

    def forward(self, x):
        # sigma = softplus(-30) ~ 0 -> the mean path; lets fidelity be
        # compared across frameworks despite independent noise streams
        return tF.conv2d(x, self.W_mu, self.bias_mu, self.stride, self.pad)


class TorchBBBLinear(tnn.Module):
    def __init__(self, fin, fout):
        super().__init__()
        self.W_mu = tnn.Parameter(torch.randn(fout, fin) * 0.1)
        self.W_rho = tnn.Parameter(torch.full((fout, fin), -30.0))
        self.bias_mu = tnn.Parameter(torch.randn(fout) * 0.1)
        self.bias_rho = tnn.Parameter(torch.full((fout,), -30.0))

    def forward(self, x):
        return tF.linear(x, self.W_mu, self.bias_mu)


class TorchSmallMR(TorchSmallCNP):
    """Reference CNPMRShapeNet1D: BBB encoder trunk (sigma pinned ~0)."""

    def __init__(self):
        super().__init__(dim_w=64, dim_r=100)
        del self.encoder_w0
        enc = tnn.Module()
        enc.net = tnn.Module()
        for name, (cin, cout) in [("layer1", (1, 32)), ("layer2", (32, 48)),
                                  ("layer3", (48, 64))]:
            blk = tnn.Module()
            blk.conv = TorchBBBConv(cin, cout, 3, 2, 1)
            setattr(enc.net, name, blk)
        enc.net.linear = TorchBBBLinear(4096, 64)
        self.encoder_w0 = enc

    def _encode(self, x):
        n = enc_in = x
        e = self.encoder_w0.net
        n = tF.relu(e.layer1.conv(n))
        n = tF.relu(e.layer2.conv(n))
        n = tF.max_pool2d(n, 2)
        n = tF.relu(e.layer3.conv(n))
        n = n.flatten(1)
        return e.linear(n)

    def forward(self, ctx_x, ctx_y, qry_x):
        t, s = ctx_x.shape[:2]
        q = qry_x.shape[1]
        x_ctx = self._encode(ctx_x.reshape(t * s, *ctx_x.shape[2:]))
        x_ctx = x_ctx.reshape(t, s, self.dim_w)
        rs = self.encoder_r.layers(
            torch.cat([x_ctx, self.transform_y(ctx_y)], -1))
        r = torch.max(rs, dim=1)[0]
        z = self.r_to_z(r)[:, None, :].repeat(1, q, 1)
        x_qry = self._encode(qry_x.reshape(t * q, *qry_x.shape[2:]))
        x_qry = x_qry.reshape(t, q, self.dim_w)
        return self.decoder0(torch.cat([x_qry, z], -1))


def test_mr_forward_fidelity_mean_path():
    torch.manual_seed(1)
    tmodel = TorchSmallMR().eval()
    ctx_x = rng.rand(2, 3, 1, 128, 128).astype(np.float32)
    ctx_y = rng.rand(2, 3, 3).astype(np.float32)
    qry_x = rng.rand(2, 2, 1, 128, 128).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(ctx_x), torch.from_numpy(ctx_y),
                      torch.from_numpy(qry_x)).numpy()

    variables = import_torch_checkpoint(
        "CNPMRShapeNet1D", state_dict_to_numpy(tmodel.state_dict()))
    model = SmallCNP(dim_w=64, dim_r=100, dim_z=64, y_dim=2, agg_mode="max",
                     bbb_encoder=True)
    got = model.apply(
        variables,
        np.transpose(ctx_x, (0, 1, 3, 4, 2)), ctx_y,
        np.transpose(qry_x, (0, 1, 3, 4, 2)),
        ctx_mask=np.ones((2, 3), bool),
        rngs={"bbb": jax.random.PRNGKey(0)})
    # sigma ~ softplus(-30) ~ 1e-13: sampling noise is negligible on both
    # sides, so the mean paths must agree
    np.testing.assert_allclose(np.asarray(got.mu), want, rtol=1e-4, atol=1e-5)
    assert float(got.kl) > 0.0


class TorchSingleTaskSmall(tnn.Module):
    """Reference SingleTaskShapeNet1D: prediction from query images alone."""

    def __init__(self, dim_w=64, dim_r=100, dim_z=64, y_dim=2):
        super().__init__()
        self.dim_w = dim_w
        base = TorchSmallCNP(dim_w=dim_w, dim_r=dim_r, dim_z=dim_z, y_dim=y_dim)
        self.encoder_w0 = base.encoder_w0
        self.encoder_r = tnn.Module()
        self.encoder_r.layers = tnn.Sequential(
            tnn.Linear(dim_w, 100), tnn.ReLU(),
            tnn.Linear(100, 100), tnn.ReLU(), tnn.Linear(100, dim_r))
        self.r_to_z = base.r_to_z
        self.decoder0 = base.decoder0

    def forward(self, qry_x):
        t, q = qry_x.shape[:2]
        x = self.encoder_w0(qry_x.reshape(t * q, *qry_x.shape[2:]))
        x = x.reshape(t, q, self.dim_w)
        r = self.encoder_r.layers(x)
        z = self.r_to_z(r)
        return self.decoder0(torch.cat([x, z], -1))


def test_single_task_forward_fidelity():
    from wmfml_tpu.models.single_task import SingleTaskSmall

    torch.manual_seed(2)
    tmodel = TorchSingleTaskSmall().eval()
    qry_x = rng.rand(2, 3, 1, 128, 128).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(qry_x)).numpy()
    variables = import_torch_checkpoint(
        "SingleTaskShapeNet1D", state_dict_to_numpy(tmodel.state_dict()))
    model = SingleTaskSmall(dim_w=64, dim_r=100, dim_z=64, y_dim=2)
    got = model.apply(variables, None, None,
                      np.transpose(qry_x, (0, 1, 3, 4, 2)))
    np.testing.assert_allclose(np.asarray(got.mu), want, rtol=1e-4, atol=1e-5)


class TorchMAML(tnn.Module):
    """Reference MAMLShapeNet1D: encoder -> 14x14 'image' -> 4 conv+BN blocks
    (batch statistics) -> avgpool -> linear + tanh."""

    def __init__(self, dim_w=196, hidden=16, y_dim=2):
        super().__init__()
        self.dim_w, self.hidden = dim_w, hidden
        self.encoder_w = tnn.Module()
        self.encoder_w.layer1 = tnn.Module()
        self.encoder_w.layer1.conv = tnn.Conv2d(1, 32, 3, 2, 1)
        self.encoder_w.layer2 = tnn.Module()
        self.encoder_w.layer2.conv = tnn.Conv2d(32, 48, 3, 2, 1)
        self.encoder_w.layer3 = tnn.Module()
        self.encoder_w.layer3.conv = tnn.Conv2d(48, 64, 3, 2, 1)
        self.encoder_w.linear = tnn.Linear(4096, dim_w)
        self.features = tnn.Module()
        cin = 1
        for i in range(1, 5):
            blk = tnn.Module()
            blk.conv = tnn.Conv2d(cin, hidden, 3, 1, 1)
            blk.norm = tnn.BatchNorm2d(hidden, momentum=1,
                                       track_running_stats=False)
            setattr(self.features, f"layer{i}", blk)
            cin = hidden
        self.regressor = tnn.Module()
        self.regressor.regressor = tnn.Linear(hidden, y_dim)

    def forward(self, x):
        e = self.encoder_w
        h = tF.relu(e.layer1.conv(x))
        h = tF.relu(e.layer2.conv(h))
        h = tF.max_pool2d(h, 2)
        h = tF.relu(e.layer3.conv(h))
        w = e.linear(h.flatten(1))
        h = w.reshape(-1, 1, 14, 14)
        for i in range(1, 5):
            blk = getattr(self.features, f"layer{i}")
            h = tF.relu(blk.norm(blk.conv(h)))
        h = h.mean(dim=(2, 3))
        return torch.tanh(self.regressor.regressor(h))


def test_maml_forward_fidelity():
    from wmfml_tpu.models.maml import MAMLRegressor

    torch.manual_seed(3)
    tmodel = TorchMAML().train()  # BN batch stats (track_running_stats=False)
    x = rng.rand(6, 1, 128, 128).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x)).numpy()
    variables = import_torch_checkpoint(
        "MAMLShapeNet1D", state_dict_to_numpy(tmodel.state_dict()))
    model = MAMLRegressor(dim_w=196, dim_hidden=16, output_dim=2,
                          tanh_out=True)
    got, kl = model.apply(variables, np.transpose(x, (0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)
    assert kl == 0.0


class TorchGatedConv(tnn.Module):
    """Reference GatedConvModel (stride-2 branch, affine FiLM conditioning)."""

    def __init__(self, ch=8, y_dim=2):
        super().__init__()
        self.ch = ch
        self.features = tnn.Module()
        cin = 1
        for i, cout in enumerate([ch, ch * 2, ch * 4, ch * 8], start=1):
            setattr(self.features, f"layer{i}_conv",
                    tnn.Conv2d(cin, cout, 3, 2, 1))
            setattr(self.features, f"layer{i}_bn",
                    tnn.BatchNorm2d(cout, affine=False, momentum=0.001))
            cin = cout
        self.classifier = tnn.Module()
        self.classifier.fully_connected = tnn.Linear(ch * 8, y_dim)

    def forward(self, x, embeddings):
        for i in range(1, 5):
            x = getattr(self.features, f"layer{i}_conv")(x)
            x = getattr(self.features, f"layer{i}_bn")(x)
            e = embeddings[i - 1]
            c = x.shape[1]
            gam, bet = e[:c], e[c:]
            x = x * (1 + gam)[None, :, None, None] + bet[None, :, None, None]
            x = tF.relu(x)
        x = x.mean(dim=(2, 3))
        return torch.tanh(self.classifier.fully_connected(x))


class TorchConvEmbedding(tnn.Module):
    """Reference ConvEmbeddingModel (avgpool_after_conv, avg pooling)."""

    def __init__(self, ch=8, hidden=16, dims=(16, 32, 64, 128)):
        super().__init__()
        self.conv = tnn.Module()
        cin = 1
        for i, cout in enumerate([ch, ch * 2, ch * 4, ch * 8], start=1):
            setattr(self.conv, f"conv{i}", tnn.Conv2d(cin, cout, 3, 2, 1))
            setattr(self.conv, f"bn{i}",
                    tnn.BatchNorm2d(cout, momentum=0.001,
                                    track_running_stats=False))
            cin = cout
        self.linear = tnn.Linear(ch * 8, hidden)
        self._embeddings = tnn.ModuleList(
            [tnn.Linear(hidden, d) for d in dims])

    def forward(self, x):
        for i in range(1, 5):
            x = getattr(self.conv, f"conv{i}")(x)
            x = getattr(self.conv, f"bn{i}")(x)
            x = tF.relu(x)
        x = x.mean(dim=(2, 3))
        x = tF.relu(self.linear(x))
        pooled = x.mean(dim=0)
        return [m(pooled) for m in self._embeddings]


def test_mmaml_forward_fidelity():
    from wmfml_tpu.models.mmaml_nets import ConvEmbeddingNet, GatedConvNet

    torch.manual_seed(4)
    ch, hidden, dims = 8, 16, (16, 32, 64, 128)
    t_gated = TorchGatedConv(ch=ch).train()
    t_embed = TorchConvEmbedding(ch=ch, hidden=hidden, dims=dims).train()
    x = rng.rand(5, 1, 64, 64).astype(np.float32)
    with torch.no_grad():
        embs = t_embed(torch.from_numpy(x))
        want = t_gated(torch.from_numpy(x), embs).numpy()

    sd = {f"model.{k}": v for k, v in
          state_dict_to_numpy(t_gated.state_dict()).items()}
    sd.update({f"embedding_model.{k}": v for k, v in
               state_dict_to_numpy(t_embed.state_dict()).items()})
    bundle_vars = import_torch_checkpoint("MMAMLShapeNet1D", sd)

    gated = GatedConvNet(output_dim=2, num_channels=ch,
                         condition_type="affine", tanh_out=True)
    embed = ConvEmbeddingNet(embedding_dims=dims, num_channels=ch,
                             hidden_size=hidden, embedding_pooling="avg")
    x_nhwc = np.transpose(x, (0, 2, 3, 1))
    got_embs = embed.apply({"params": bundle_vars["params"]["embedding"]},
                           x_nhwc)
    for a, b in zip(got_embs, embs):
        np.testing.assert_allclose(np.asarray(a), b.numpy(), rtol=2e-4,
                                   atol=2e-5)
    got = gated.apply({"params": bundle_vars["params"]["model"]}, x_nhwc,
                      embeddings=got_embs)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)
