"""Round-2 importer fidelity: the 8 methods added to MODEL_IMPORTERS plus a
large-ANP attention test covering the trunk-flatten (CHW->HWC) permutation of
W_k/W_q and task_encoder.0.

Replicas are freshly written torch modules mirroring the reference layer
layouts (imports of the reference itself are impossible here: torchmeta /
imgaug / pytorch_metric_learning are not installed). Key-set drift between
replicas and the reference source is pinned by tests/test_state_dict_keys.py.
"""

import math

import jax
import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as tF

from tests.test_torch_import import (TorchBBBConv, TorchBBBLinear,
                                     TorchFavorAttention, TorchLargeCNP,
                                     TorchMAML, TorchTrunk)
from wmfml_tpu.ckpt.torch_import import (MODEL_IMPORTERS,
                                         import_torch_checkpoint,
                                         state_dict_to_numpy)
from wmfml_tpu.models.neural_process import LargeCNP

rng = np.random.RandomState(11)


def test_importer_matrix_covers_every_registry_method():
    from wmfml_tpu.models.registry import available_methods

    assert set(MODEL_IMPORTERS) == set(available_methods()), (
        "every registry method needs a torch importer")


# ---------------------------------------------------------------------------
# VanillaMAML: bare MetaLinear regressor key (networks/VanillaMAML.py:94)
# ---------------------------------------------------------------------------

class TorchVanillaMAML(TorchMAML):
    def __init__(self, **kw):
        super().__init__(**kw)
        lin = self.regressor.regressor
        self.regressor = lin  # bare MetaLinear: keys 'regressor.{weight,bias}'

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
        return self.regressor(h)  # no tanh (VanillaMAML)


def test_vanilla_maml_forward_fidelity():
    from wmfml_tpu.models.maml import MAMLRegressor

    torch.manual_seed(7)
    tmodel = TorchVanillaMAML(hidden=16).train()
    x = rng.rand(5, 1, 128, 128).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x)).numpy()
    variables = import_torch_checkpoint(
        "VanillaMAML", state_dict_to_numpy(tmodel.state_dict()))
    model = MAMLRegressor(dim_w=196, dim_hidden=16, output_dim=2,
                          tanh_out=False)
    got, kl = model.apply(variables, np.transpose(x, (0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


# ---------------------------------------------------------------------------
# MAMLMR / MAMLMRShapeNet1D: BBB encoder outside the meta tree
# (networks/MAMLMR.py:50-63,99-128)
# ---------------------------------------------------------------------------

class TorchMAMLMR(tnn.Module):
    def __init__(self, dim_w=196, hidden=16, y_dim=2, tanh=False):
        super().__init__()
        self.tanh = tanh
        self.encoder_w = tnn.Module()
        self.encoder_w.net = tnn.Module()
        for name, (cin, cout) in [("layer1", (1, 32)), ("layer2", (32, 48)),
                                  ("layer3", (48, 64))]:
            blk = tnn.Module()
            blk.conv = TorchBBBConv(cin, cout, 3, 2, 1)
            setattr(self.encoder_w.net, name, blk)
        self.encoder_w.net.linear = TorchBBBLinear(4096, dim_w)
        self.features = tnn.Module()
        cin = 1
        for i in range(1, 5):
            blk = tnn.Module()
            blk.conv = tnn.Conv2d(cin, hidden, 3, 1, 1)
            blk.norm = tnn.BatchNorm2d(hidden, momentum=1,
                                       track_running_stats=False)
            setattr(self.features, f"layer{i}", blk)
            cin = hidden
        if tanh:  # MAMLMRShapeNet1D: MetaSequential('linear', 'Tanh')
            self.regressor = tnn.Module()
            self.regressor.linear = tnn.Linear(hidden, y_dim)
        else:     # MAMLMR: bare MetaLinear
            self.regressor = tnn.Linear(hidden, y_dim)

    def forward(self, x):
        e = self.encoder_w.net
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
        if self.tanh:
            return torch.tanh(self.regressor.linear(h))
        return self.regressor(h)


def _check_maml_mr(method, tanh):
    from wmfml_tpu.models.maml import MAMLRegressor

    torch.manual_seed(8)
    tmodel = TorchMAMLMR(hidden=16, tanh=tanh).train()
    x = rng.rand(5, 1, 128, 128).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x)).numpy()
    variables = import_torch_checkpoint(
        method, state_dict_to_numpy(tmodel.state_dict()))
    model = MAMLRegressor(dim_w=196, dim_hidden=16, output_dim=2,
                          tanh_out=tanh, bbb_encoder=True)
    got, kl = model.apply(variables, np.transpose(x, (0, 2, 3, 1)),
                          rngs={"bbb": jax.random.PRNGKey(0)})
    # sigma = softplus(-30) ~ 1e-13: mean paths must agree
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)
    assert float(kl) > 0.0  # BBB encoder reports its KL


def test_maml_mr_forward_fidelity():
    _check_maml_mr("MAMLMR", tanh=False)


def test_maml_mr_shapenet1d_forward_fidelity():
    _check_maml_mr("MAMLMRShapeNet1D", tanh=True)


# ---------------------------------------------------------------------------
# SingleTaskShapeNet3D / SingleTaskDistractor
# (networks/SingleTaskShapeNet3D.py:54-73 — query-only LargeCNP subset)
# ---------------------------------------------------------------------------

class TorchTrunkMax(TorchTrunk):
    """ImageEncoder with img_agg='max' (AdaptiveMaxPool2d(2,2), CHW flatten)."""

    def forward(self, x):
        x = tF.relu(self.conv1(x))
        for i in range(1, 5):
            from tests.test_torch_import import _run_block
            x = _run_block(getattr(self.resnet, f"layer{i}")[0], x)
        x = tF.adaptive_max_pool2d(x, (2, 2))
        return x.reshape(x.size(0), -1)


class TorchSingleTaskLarge(tnn.Module):
    def __init__(self, in_ch=3, y_dim=4, img_agg="reshape"):
        super().__init__()
        trunk_cls = TorchTrunk if img_agg == "reshape" else TorchTrunkMax
        self.img_encoder = trunk_cls(in_ch=in_ch)
        self.task_encoder = tnn.Sequential(
            tnn.Linear(256, 256), tnn.ReLU(), tnn.Linear(256, 256),
            tnn.ReLU(), tnn.Linear(256, 256), tnn.ReLU())
        self.mu = tnn.Linear(256, 256)
        self.decoder = tnn.Module()
        dec = trunk_cls(in_ch=in_ch)
        self.decoder.conv1 = dec.conv1
        self.decoder.resnet = dec.resnet
        self._dec_trunk = dec
        self.decoder.fc_mu = tnn.Sequential(
            tnn.Linear(512, 256), tnn.ReLU(), tnn.Linear(256, 256),
            tnn.ReLU(), tnn.Linear(256, y_dim))

    def forward(self, qry_x):
        t, q = qry_x.shape[:2]
        flat = qry_x.reshape(t * q, *qry_x.shape[2:])
        x = self.img_encoder(flat).reshape(t, q, -1)
        sample = self.mu(self.task_encoder(x))
        feats = self._dec_trunk(flat).reshape(t, q, -1)
        return self.decoder.fc_mu(torch.cat([feats, sample], -1))


def _check_single_task_large(method, in_ch, hw, img_agg, y_dim):
    from wmfml_tpu.models.single_task import SingleTaskLarge

    torch.manual_seed(9)
    tmodel = TorchSingleTaskLarge(in_ch=in_ch, y_dim=y_dim,
                                  img_agg=img_agg).eval()
    qry_x = rng.rand(2, 2, in_ch, hw, hw).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(qry_x)).numpy()
    variables = import_torch_checkpoint(
        method, state_dict_to_numpy(tmodel.state_dict()))
    model = SingleTaskLarge(img_agg=img_agg, y_dim=y_dim)
    got = model.apply(variables, None, None,
                      np.transpose(qry_x, (0, 1, 3, 4, 2)))
    np.testing.assert_allclose(np.asarray(got.mu), want, rtol=2e-4, atol=2e-5)


def test_single_task_shapenet3d_forward_fidelity():
    _check_single_task_large("SingleTaskShapeNet3D", 3, 64, "reshape", 4)


def test_single_task_distractor_forward_fidelity():
    _check_single_task_large("SingleTaskDistractor", 1, 128, "max", 2)


# ---------------------------------------------------------------------------
# Large ANP (+FCLANP alias): attention W_k/W_q consume CHW-flattened trunk
# features -> the import must permute them (networks/ANP.py:117-123)
# ---------------------------------------------------------------------------

class TorchLargeANP(TorchLargeCNP):
    def __init__(self, label_dim=4, y_dim=4, n_heads=8, h_dim=256):
        super().__init__(label_dim=label_dim, y_dim=y_dim)
        self.n_heads = n_heads

        def head():
            lin = tnn.Module()
            lin.linear = tnn.Linear(h_dim, h_dim)
            return lin
        self._W_k = tnn.ModuleList([head() for _ in range(n_heads)])
        self._W_v = tnn.ModuleList([head() for _ in range(n_heads)])
        self._W_q = tnn.ModuleList([head() for _ in range(n_heads)])
        self._W = tnn.Module()
        self._W.linear = tnn.Linear(n_heads * h_dim, h_dim)
        self.attn = TorchFavorAttention(h_dim, int(h_dim * math.log(h_dim)))

    def forward(self, ctx_x, ctx_y, qry_x):
        t, s = ctx_x.shape[:2]
        q = qry_x.shape[1]
        x_ctx = self.img_encoder(
            ctx_x.reshape(t * s, *ctx_x.shape[2:])).reshape(t, s, -1)
        x_qry = self._dec_trunk(
            qry_x.reshape(t * q, *qry_x.shape[2:]))
        x_qry_enc = self.img_encoder(
            qry_x.reshape(t * q, *qry_x.shape[2:])).reshape(t, q, -1)
        feats = self.task_encoder(torch.cat([x_ctx, ctx_y], -1))
        ks = torch.stack([m.linear(x_ctx) for m in self._W_k], 1)
        vs = torch.stack([m.linear(feats) for m in self._W_v], 1)
        qs = torch.stack([m.linear(x_qry_enc) for m in self._W_q], 1)
        outs = self.attn(qs, ks, vs)
        outs = outs.permute(0, 2, 3, 1).reshape(t, q, -1)
        sample = self.mu(self._W.linear(outs))
        feats_q = x_qry.reshape(t, q, -1)
        return self.decoder.fc_mu(torch.cat([feats_q, sample], -1))


def test_large_anp_forward_fidelity_with_kq_permutation():
    torch.manual_seed(10)
    tmodel = TorchLargeANP().eval()
    # scale trunk weights so features are O(1): permutation bugs then show
    # as O(1) errors instead of hiding under tolerance
    with torch.no_grad():
        tmodel.img_encoder.conv1.weight *= 3.0
        tmodel.decoder.conv1.weight *= 3.0
    ctx_x = rng.rand(2, 3, 3, 64, 64).astype(np.float32)
    quats = rng.rand(2, 3, 4).astype(np.float32)
    qry_x = rng.rand(2, 2, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(ctx_x), torch.from_numpy(quats),
                      torch.from_numpy(qry_x)).numpy()
    variables = import_torch_checkpoint(
        "ANP", state_dict_to_numpy(tmodel.state_dict()))
    model = LargeCNP(img_agg="reshape", agg_mode="attention", y_dim=4)
    got = model.apply(
        variables, np.transpose(ctx_x, (0, 1, 3, 4, 2)), quats,
        np.transpose(qry_x, (0, 1, 3, 4, 2)), ctx_mask=np.ones((2, 3), bool))
    np.testing.assert_allclose(np.asarray(got.mu), want, rtol=2e-3, atol=2e-3)


# ---------------------------------------------------------------------------
# ANPMRShapeNet3D: BBB ResNet trunk + attention
# (networks/ANPMRShapeNet3D.py:30-90,143-200)
# ---------------------------------------------------------------------------

class TorchBBBTrunk(tnn.Module):
    """BBBEncoder: 5x5 s2 conv + 4 BasicBlocks of biased 3x3 BBB convs whose
    'conv1x1' downsample is really 3x3 s2 p1 (kwargs quirk)."""

    def __init__(self, in_ch=3):
        super().__init__()
        self.net = tnn.Module()
        l1 = tnn.Module()
        l1.conv = TorchBBBConv(in_ch, 64, 5, 2, 2)
        self.net.layer1 = l1
        for i in range(2, 6):
            blk = tnn.Module()
            blk.conv1 = TorchBBBConv(64, 64, 3, 2, 1)
            blk.conv2 = TorchBBBConv(64, 64, 3, 1, 1)
            blk.downsample = tnn.Sequential(TorchBBBConv(64, 64, 3, 2, 1))
            setattr(self.net, f"layer{i}", blk)

    def forward(self, x):
        x = tF.relu(self.net.layer1.conv(x))
        for i in range(2, 6):
            blk = getattr(self.net, f"layer{i}")
            out = tF.relu(blk.conv1(x))
            out = blk.conv2(out)
            x = tF.relu(out + blk.downsample[0](x))
        return x.reshape(x.size(0), -1)  # pixel_agg 'reshape': CHW flatten


class TorchANPMR3D(tnn.Module):
    def __init__(self, label_dim=4, y_dim=4, n_heads=8, h_dim=256):
        super().__init__()
        self.img_encoder = TorchBBBTrunk()
        self.task_encoder = tnn.Sequential(
            tnn.Linear(256 + label_dim, 256), tnn.ReLU(),
            tnn.Linear(256, 256), tnn.ReLU(), tnn.Linear(256, 256), tnn.ReLU())
        self.mu = tnn.Linear(256, 256)
        self.decoder = tnn.Module()
        dec = TorchTrunk()
        self.decoder.conv1 = dec.conv1
        self.decoder.resnet = dec.resnet
        self._dec_trunk = dec
        self.decoder.fc_mu = tnn.Sequential(
            tnn.Linear(512, 256), tnn.ReLU(), tnn.Linear(256, 256),
            tnn.ReLU(), tnn.Linear(256, y_dim))
        self.n_heads = n_heads

        def head():
            lin = tnn.Module()
            lin.linear = tnn.Linear(h_dim, h_dim)
            return lin
        self._W_k = tnn.ModuleList([head() for _ in range(n_heads)])
        self._W_v = tnn.ModuleList([head() for _ in range(n_heads)])
        self._W_q = tnn.ModuleList([head() for _ in range(n_heads)])
        self._W = tnn.Module()
        self._W.linear = tnn.Linear(n_heads * h_dim, h_dim)
        self.attn = TorchFavorAttention(h_dim, int(h_dim * math.log(h_dim)))

    def forward(self, ctx_x, ctx_y, qry_x):
        t, s = ctx_x.shape[:2]
        q = qry_x.shape[1]
        x_ctx = self.img_encoder(
            ctx_x.reshape(t * s, *ctx_x.shape[2:])).reshape(t, s, -1)
        x_qry = self.img_encoder(
            qry_x.reshape(t * q, *qry_x.shape[2:])).reshape(t, q, -1)
        feats = self.task_encoder(torch.cat([x_ctx, ctx_y], -1))
        ks = torch.stack([m.linear(x_ctx) for m in self._W_k], 1)
        vs = torch.stack([m.linear(feats) for m in self._W_v], 1)
        qs = torch.stack([m.linear(x_qry) for m in self._W_q], 1)
        outs = self.attn(qs, ks, vs)
        outs = outs.permute(0, 2, 3, 1).reshape(t, q, -1)
        sample = self.mu(self._W.linear(outs))
        feats_q = self._dec_trunk(
            qry_x.reshape(t * q, *qry_x.shape[2:])).reshape(t, q, -1)
        return self.decoder.fc_mu(torch.cat([feats_q, sample], -1))


def test_anpmr_shapenet3d_forward_fidelity():
    torch.manual_seed(12)
    tmodel = TorchANPMR3D().eval()
    ctx_x = rng.rand(1, 3, 3, 64, 64).astype(np.float32)
    quats = rng.rand(1, 3, 4).astype(np.float32)
    qry_x = rng.rand(1, 2, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(ctx_x), torch.from_numpy(quats),
                      torch.from_numpy(qry_x)).numpy()
    variables = import_torch_checkpoint(
        "ANPMRShapeNet3D", state_dict_to_numpy(tmodel.state_dict()))
    model = LargeCNP(img_agg="reshape", agg_mode="attention", y_dim=4,
                     bbb_trunk=True)
    got = model.apply(
        variables, np.transpose(ctx_x, (0, 1, 3, 4, 2)), quats,
        np.transpose(qry_x, (0, 1, 3, 4, 2)), ctx_mask=np.ones((1, 3), bool),
        rngs={"bbb": jax.random.PRNGKey(0)})
    np.testing.assert_allclose(np.asarray(got.mu), want, rtol=2e-3, atol=2e-3)
    assert float(got.kl) > 0.0  # KL from the query trunk pass
