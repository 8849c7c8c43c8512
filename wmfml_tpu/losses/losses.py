"""Task losses and metrics, pure-jnp and jit/vmap/grad friendly.

Reproduces the exact metric definitions of the reference
(`/root/reference/trainer/losses.py`):

  * distractor          — mean Euclidean pixel distance            (:34-36)
  * shapenet_3d         — antipodal-symmetric quaternion L1        (:50-57)
  * shapenet_1d (train) — MSE on [cos, sin]                        (:59-61)
  * shapenet_1d (test)  — mean angular error in degrees, min over
                          +/-360° wraps, acos decode w/ sin branch (:63-76)
  * pascal_1d           — plain MSE                                (:78-80)
  * NT-Xent contrastive losses for the FCL variants                (:82-99)

Deviation from the reference (documented): ``degree_loss`` clips cos into
[-1, 1] before acos. The reference relies on its Tanh output head keeping
|cos| < 1; torch.acos would return NaN otherwise. Identical values on the
reference's reachable input range.
"""

from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp


def _masked_mean(x: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Mean of x; if mask given (broadcastable to x) average only where True."""
    if mask is None:
        return jnp.mean(x)
    mask = jnp.broadcast_to(mask, x.shape).astype(x.dtype)
    return jnp.sum(x * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def euclidean_distance_loss(gt_y, pr_mu, mask=None):
    """Mean Euclidean distance in pixels (distractor metric)."""
    d = jnp.sqrt(jnp.sum((gt_y - pr_mu) ** 2, axis=-1))
    return _masked_mean(d, mask)


def quaternion_loss(q_gt, q_pr, mask=None, eps: float = 1e-12):
    """L1 between gt quat and unit-normalized prediction, min over antipodes."""
    norm = jnp.sqrt(jnp.sum(q_pr**2, axis=-1, keepdims=True))
    q_pr = q_pr / jnp.maximum(norm, eps)
    pos = jnp.sum(jnp.abs(q_gt - q_pr), axis=-1)
    neg = jnp.sum(jnp.abs(-q_gt - q_pr), axis=-1)
    return _masked_mean(jnp.minimum(pos, neg), mask)


def azimuth_loss(q_gt, q_pr, mask=None):
    """ShapeNet1D train loss: sum-of-squares over [cos, sin], mean over set."""
    se = jnp.sum((q_gt[..., :2] - q_pr) ** 2, axis=-1)
    return _masked_mean(se, mask)


def degree_loss(q_gt, q_pr, mask=None):
    """ShapeNet1D eval metric: mean angular error in degrees.

    Decode predicted angle as acos(cos) when sin >= 0 else 2*pi - acos(cos),
    then take min over {|d|, |d+360|, |d-360|}.
    """
    gt_deg = jnp.rad2deg(q_gt[..., -1])
    pr_cos = jnp.clip(q_pr[..., 0], -1.0, 1.0)
    pr_sin = q_pr[..., 1]
    base = jnp.arccos(pr_cos)
    pr_rad = jnp.where(pr_sin >= 0, base, 2.0 * math.pi - base)
    pr_deg = jnp.rad2deg(pr_rad)
    errors = jnp.stack(
        [
            jnp.abs(gt_deg - pr_deg),
            jnp.abs(gt_deg + 360.0 - pr_deg),
            jnp.abs(gt_deg - (pr_deg + 360.0)),
        ],
        axis=-1,
    )
    return _masked_mean(jnp.min(errors, axis=-1), mask)


def mean_square_loss(q_gt, q_pr, mask=None):
    se = (q_gt - q_pr) ** 2
    if mask is not None:
        mask = mask[..., None]  # broadcast over label dim
    return _masked_mean(se, mask)


# --- contrastive (NT-Xent), matching pytorch_metric_learning.NTXentLoss -----


def nt_xent(z: jnp.ndarray, labels: jnp.ndarray, temperature: float = 0.07):
    """NT-Xent over embeddings ``z`` [N, D] with integer ``labels`` [N].

    Matches pytorch_metric_learning's NTXentLoss: cosine similarity; for each
    ordered positive pair (a, p) the loss is
        -log( exp(s_ap/t) / (exp(s_ap/t) + sum_n exp(s_an/t)) )
    where n ranges over anchors with a different label than a; mean over all
    positive pairs. (`/root/reference/trainer/losses.py:82-99` semantics.)
    """
    n = z.shape[0]
    # clamp BEFORE the sqrt: sqrt'(0)=inf would leak 0*inf=NaN through a
    # post-hoc maximum() if a row were exactly zero
    z = z / jnp.sqrt(jnp.maximum(
        jnp.sum(z * z, axis=-1, keepdims=True), 1e-24))
    sim = (z @ z.T) / temperature  # [N, N]

    same = labels[:, None] == labels[None, :]
    eye = jnp.eye(n, dtype=bool)
    pos_mask = same & ~eye          # ordered positive pairs
    neg_mask = ~same                # negatives per anchor (row)

    # log-sum-exp over negatives per anchor, computed stably. The mask must
    # be applied BEFORE the exp (excluded entries enter as -inf -> exp 0,
    # zero gradient): exp'ing the raw sim first overflows on the excluded
    # same-label entries once embeddings saturate (|sim| ~ 1/t > 88 for
    # t=0.007), and the discarded inf leaks 0*inf=NaN into the backward
    # pass — observed as a deterministic NaN at FCLANP iteration ~60-90.
    neg_sim = jnp.where(neg_mask, sim, -jnp.inf)
    neg_max = jnp.max(neg_sim, axis=1, keepdims=True)
    neg_max = jnp.where(jnp.isfinite(neg_max), neg_max, 0.0)
    neg_sum = jnp.sum(jnp.exp(neg_sim - neg_max), axis=1, keepdims=True)

    # For each positive pair: denom = exp(s_ap - m) + sum_neg exp(s_an - m)
    # with shared shift m = max(neg_max, s_ap) for stability.
    m = jnp.maximum(neg_max, sim)
    pos_term = jnp.exp(sim - m)
    neg_term = neg_sum * jnp.exp(neg_max - m)
    per_pair = -(sim - m) + jnp.log(pos_term + neg_term)

    num_pos = jnp.maximum(jnp.sum(pos_mask), 1)
    return jnp.sum(jnp.where(pos_mask, per_pair, 0.0)) / num_pos


def contrastive_loss(z1, z2, t: float = 0.07):
    """Two-view NT-Xent: z1[i] and z2[i] are views of the same instance."""
    z = jnp.concatenate([z1, z2], axis=0)
    labels = jnp.concatenate(
        [jnp.arange(z1.shape[0]), jnp.arange(z2.shape[0])], axis=0
    )
    return nt_xent(z, labels, temperature=t)


def contrastive_loss_anp(z, t: float = 0.07):
    """Per-task NT-Xent over query representations z [T, Q, D]."""
    tasks, q, d = z.shape
    labels = jnp.repeat(jnp.arange(tasks), q)
    return nt_xent(z.reshape(tasks * q, d), labels, temperature=t)


class LossFunc:
    """Task-dispatch loss, API-compatible with the reference's LossFunc."""

    def __init__(self, loss_type: str, task: str):
        if loss_type != "mse":
            raise NotImplementedError(
                f"loss_type={loss_type!r}: only 'mse' is implemented (the "
                "reference advertises 'nll' but never implements it)")
        self.loss_type = loss_type
        self.task = task

    def calc_loss(self, pr_mu, pr_var, gt_y, test: bool = False, mask=None):
        del pr_var  # reserved for an NLL variant, as in the reference
        if self.task == "distractor":
            return euclidean_distance_loss(gt_y, pr_mu, mask)
        if self.task == "shapenet_3d":
            return quaternion_loss(gt_y, pr_mu, mask)
        if self.task == "shapenet_1d":
            return degree_loss(gt_y, pr_mu, mask) if test else azimuth_loss(gt_y, pr_mu, mask)
        if self.task == "pascal_1d":
            return mean_square_loss(gt_y, pr_mu, mask)
        raise TypeError(f"unknown task {self.task!r}")

    # staticmethod aliases mirroring the reference surface
    quaternion_loss = staticmethod(quaternion_loss)
    azimuth_loss = staticmethod(azimuth_loss)
    degree_loss = staticmethod(degree_loss)
    mean_square_loss = staticmethod(mean_square_loss)
    contrastive_loss = staticmethod(contrastive_loss)
    contrastive_loss_ANP = staticmethod(contrastive_loss_anp)
