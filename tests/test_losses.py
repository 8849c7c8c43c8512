"""Golden-value tests for losses against an independent numpy/torch oracle.

The reference's metric definitions (trainer/losses.py) are re-derived here in
plain numpy (and torch where it disambiguates semantics) and compared to the
jnp implementations.
"""

import math

import numpy as np
import pytest

from wmfml_tpu.losses import (
    LossFunc,
    azimuth_loss,
    contrastive_loss,
    contrastive_loss_anp,
    degree_loss,
    euclidean_distance_loss,
    mean_square_loss,
    nt_xent,
    quaternion_loss,
)

rng = np.random.RandomState(0)


def test_euclidean_distance():
    gt = rng.randn(4, 7, 2).astype(np.float32) * 30
    pr = rng.randn(4, 7, 2).astype(np.float32) * 30
    want = np.mean(np.sqrt(np.sum((gt - pr) ** 2, axis=-1)))
    got = float(euclidean_distance_loss(gt, pr))
    assert abs(got - want) < 1e-4


def test_quaternion_loss():
    q_gt = rng.randn(5, 9, 4).astype(np.float32)
    q_gt /= np.linalg.norm(q_gt, axis=-1, keepdims=True)
    q_pr = rng.randn(5, 9, 4).astype(np.float32)

    q_n = q_pr / np.linalg.norm(q_pr, axis=-1, keepdims=True)
    pos = np.abs(q_gt - q_n).sum(-1)
    neg = np.abs(-q_gt - q_n).sum(-1)
    want = np.minimum(pos, neg).mean()
    got = float(quaternion_loss(q_gt, q_pr))
    assert abs(got - want) < 1e-5


def test_azimuth_loss():
    gt = rng.randn(3, 8, 3).astype(np.float32)
    pr = rng.randn(3, 8, 2).astype(np.float32)
    want = np.mean(np.sum((gt[..., :2] - pr) ** 2, axis=-1))
    assert abs(float(azimuth_loss(gt, pr)) - want) < 1e-5


def torch_degree_loss(q_gt, q_pr):
    """Literal re-implementation of reference degree_loss in torch (oracle)."""
    import torch

    q_gt = torch.as_tensor(q_gt)
    q_pr = torch.as_tensor(q_pr)
    gt = torch.rad2deg(q_gt[..., -1])
    pr_cos = q_pr[..., 0]
    pr_sin = q_pr[..., 1]
    ng = torch.where(pr_sin < 0)
    pr_deg = torch.acos(pr_cos)
    pr_deg_ng = -torch.acos(pr_cos) + 2 * math.pi
    pr_deg[ng] = pr_deg_ng[ng]
    pr_deg = torch.rad2deg(pr_deg)
    errs = torch.stack(
        (torch.abs(gt - pr_deg), torch.abs(gt + 360 - pr_deg),
         torch.abs(gt - (pr_deg + 360))), dim=-1)
    return float(torch.min(errs, dim=-1)[0].mean())


def test_degree_loss_vs_torch_oracle():
    angles = rng.uniform(0, 2 * math.pi, size=(6, 11)).astype(np.float32)
    gt = np.stack([np.cos(angles), np.sin(angles), angles], axis=-1)
    # predictions from a Tanh head: cos/sin in (-1, 1)
    pr = np.tanh(rng.randn(6, 11, 2)).astype(np.float32)
    want = torch_degree_loss(gt, pr)
    got = float(degree_loss(gt, pr))
    assert abs(got - want) < 1e-3


def test_mean_square_loss():
    gt = rng.randn(3, 5, 1).astype(np.float32)
    pr = rng.randn(3, 5, 1).astype(np.float32)
    assert abs(float(mean_square_loss(gt, pr)) - np.mean((gt - pr) ** 2)) < 1e-6


def torch_ntxent(z, labels, t):
    from pytorch_metric_learning.losses import NTXentLoss  # noqa
    import torch

    return float(NTXentLoss(temperature=t)(torch.as_tensor(z), torch.as_tensor(labels)))


def test_nt_xent_vs_pml_if_available():
    z = rng.randn(12, 16).astype(np.float32)
    labels = np.repeat(np.arange(6), 2)
    got = float(nt_xent(z, labels, temperature=0.07))
    try:
        want = torch_ntxent(z, labels, 0.07)
    except ImportError:
        # fall back to a direct numpy oracle of the same definition
        zz = z / np.linalg.norm(z, axis=-1, keepdims=True)
        sim = zz @ zz.T / 0.07
        total, count = 0.0, 0
        for a in range(12):
            for p in range(12):
                if a != p and labels[a] == labels[p]:
                    negs = sim[a][labels != labels[a]]
                    denom = np.exp(sim[a, p]) + np.exp(negs).sum()
                    total += -np.log(np.exp(sim[a, p]) / denom)
                    count += 1
        want = total / count
    assert abs(got - want) < 5e-3 * max(1.0, abs(want))


def test_contrastive_wrappers_run():
    z1 = rng.randn(6, 8).astype(np.float32)
    z2 = rng.randn(6, 8).astype(np.float32)
    assert np.isfinite(float(contrastive_loss(z1, z2)))
    z = rng.randn(4, 5, 8).astype(np.float32)
    assert np.isfinite(float(contrastive_loss_anp(z)))


def test_lossfunc_dispatch():
    lf = LossFunc("mse", "shapenet_1d")
    angles = rng.uniform(0, 2 * math.pi, size=(2, 3)).astype(np.float32)
    gt = np.stack([np.cos(angles), np.sin(angles), angles], axis=-1)
    pr = np.tanh(rng.randn(2, 3, 2)).astype(np.float32)
    train = float(lf.calc_loss(pr, None, gt, test=False))
    test = float(lf.calc_loss(pr, None, gt, test=True))
    assert train > 0 and test > 0
    with pytest.raises(NotImplementedError):
        LossFunc("nll", "shapenet_1d")


def test_masked_losses_ignore_padding():
    gt = rng.randn(2, 6, 2).astype(np.float32)
    pr = rng.randn(2, 6, 2).astype(np.float32)
    mask = np.zeros((2, 6), dtype=bool)
    mask[:, :4] = True
    want = np.mean(np.sqrt(np.sum((gt[:, :4] - pr[:, :4]) ** 2, axis=-1)))
    got = float(euclidean_distance_loss(gt, pr, mask))
    assert abs(got - want) < 1e-5


def test_nt_xent_saturated_grad_finite():
    """Regression: FCLANP (t=0.007) NaN'd deterministically at ~iter 60-90.

    Once the encoder saturates (same-task reps aligned, cross-task reps
    anti-aligned), |sim|/t exceeds exp's f32 range on the entries the
    negative mask EXCLUDES; exp-then-mask leaked 0*inf=NaN into the
    backward pass while the forward stayed finite (loss exactly 0.0).
    The mask must go through the exp as -inf. See losses.py nt_xent.
    """
    import jax
    import jax.numpy as jnp

    t_, q_, d_ = 4, 5, 8
    dirs = np.zeros((t_, d_), np.float32)
    for i in range(t_):
        dirs[i, i] = 1.0
    dirs[1] = -dirs[0]  # an anti-aligned task pair drives sim to -1/t
    z = np.repeat(dirs[:, None, :], q_, axis=1) * 3.0

    grad = jax.jit(jax.value_and_grad(
        lambda z: contrastive_loss_anp(jnp.asarray(z), t=0.007)))
    val, g = grad(z)
    assert float(val) == 0.0  # fully saturated
    assert np.isfinite(np.asarray(g)).all()

    z[0, 0] = 0.0  # zero-norm row must not NaN either (sqrt'(0) guard)
    val, g = grad(z)
    assert np.isfinite(float(val)) and np.isfinite(np.asarray(g)).all()
