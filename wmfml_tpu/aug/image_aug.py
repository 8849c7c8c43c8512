"""Device-side image augmentation (replaces the reference's CPU imgaug path).

The reference runs imgaug pipelines synchronously on host every iteration
(`utils/augment.py:22-79` — its #1 input bottleneck). Here every op is a
jittable jnp transform on [B, H, W, C] float images in [0, 1], vmapped over
the batch with per-image PRNG keys, so augmentation fuses into the training
step and costs ~nothing against the conv trunks.

Op semantics mirror imgaug's (parameter ranges from the reference pipelines;
uint8-scale constants rescaled to [0, 1]):

  * crop_and_pad   — iaa.CropAndPad(percent=(0, .05), keep_size=True):
                     pad p per side + resize back == scale by 1/(1+2p) w/ fill
  * affine         — iaa.Affine(scale .8-1.2 per axis, translate +/-10%)
  * gamma_contrast — iaa.GammaContrast(.5-2)
  * brightness     — iaa.AddToBrightness(-30..30) / 255
  * average_blur   — iaa.AverageBlur(k<=3): 3x3 mean filter, applied or not
  * dropout        — iaa.Dropout(.01-.1, per_channel=.5)
  * coarse_dropout — iaa.CoarseDropout((0,.05), size_percent .02-.25)

Each is wrapped in ``sometimes(0.5)``. Deviation (documented): imgaug applies
ops in random order; we use a fixed order — ops commute approximately and the
paper's DA ablation does not depend on ordering. Exact RNG streams differ by
construction; tests assert distributional properties instead.
"""

from __future__ import annotations

from typing import Callable, List

import jax
import jax.numpy as jnp


def _interp_matrix(n: int, src: jnp.ndarray) -> jnp.ndarray:
    """[n, n] bilinear interpolation matrix: row i mixes input taps for
    output position i sampling at ``src[i]``; out-of-range taps get zero
    weight (their mass is filled with cval by the caller)."""
    i0 = jnp.floor(src)
    frac = src - i0
    w0, w1 = 1.0 - frac, frac
    valid0 = (i0 >= 0) & (i0 < n)
    valid1 = (i0 + 1 >= 0) & (i0 + 1 < n)
    i0c = jnp.clip(i0, 0, n - 1).astype(jnp.int32)
    i1c = jnp.clip(i0 + 1, 0, n - 1).astype(jnp.int32)
    eye0 = jax.nn.one_hot(i0c, n, dtype=jnp.float32)
    eye1 = jax.nn.one_hot(i1c, n, dtype=jnp.float32)
    return (w0 * valid0)[:, None] * eye0 + (w1 * valid1)[:, None] * eye1


def _affine_warp(img: jnp.ndarray, scale_xy, translate_xy, cval) -> jnp.ndarray:
    """Bilinear affine warp about the image center with constant fill.

    img [H, W, C]; scale/translate are (x, y) tuples; output pixel (x, y)
    samples input at center + (x - center - tx) / sx.

    Scale+translate is separable, so the warp is two small matmuls
    (row-mix then column-mix) — MXU work instead of the double gather XLA
    would emit for coordinate indexing. Constant fill is applied via the
    interpolation matrices' missing mass (exactly per-tap cval semantics).
    """
    h, w, _ = img.shape
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    sx, sy = scale_xy
    tx, ty = translate_xy
    src_y = (jnp.arange(h, dtype=jnp.float32) - cy - ty) / sy + cy
    src_x = (jnp.arange(w, dtype=jnp.float32) - cx - tx) / sx + cx

    wy = _interp_matrix(h, src_y)                      # [H, H]
    wx = _interp_matrix(w, src_x)                      # [W, W]
    out = jnp.einsum("ih,hwc,jw->ijc", wy, img.astype(jnp.float32), wx,
                     preferred_element_type=jnp.float32)
    coverage = (jnp.sum(wy, axis=1)[:, None] * jnp.sum(wx, axis=1)[None, :])
    return (out + cval * (1.0 - coverage)[:, :, None]).astype(img.dtype)


def crop_and_pad(key, img):
    kp, kc = jax.random.split(key)
    p = jax.random.uniform(kp, (), minval=0.0, maxval=0.05)
    cval = jax.random.uniform(kc, ())
    s = 1.0 / (1.0 + 2.0 * p)
    return _affine_warp(img, (s, s), (0.0, 0.0), cval)


def affine(key, img, scale=(0.8, 1.2), translate=0.1):
    ks, kt, kc = jax.random.split(key, 3)
    sxy = jax.random.uniform(ks, (2,), minval=scale[0], maxval=scale[1])
    h, w, _ = img.shape
    txy = jax.random.uniform(kt, (2,), minval=-translate, maxval=translate)
    txy = txy * jnp.array([w, h], jnp.float32)
    cval = jax.random.uniform(kc, ())
    return _affine_warp(img, (sxy[0], sxy[1]), (txy[0], txy[1]), cval)


def gamma_contrast(key, img, lo=0.5, hi=2.0):
    gamma = jax.random.uniform(key, (), minval=lo, maxval=hi)
    return jnp.clip(img, 1e-6, 1.0) ** gamma


def brightness(key, img, amount=30.0 / 255.0):
    b = jax.random.uniform(key, (), minval=-amount, maxval=amount)
    return jnp.clip(img + b, 0.0, 1.0)


def average_blur(key, img):
    """3x3 mean blur, applied with prob 2/3 (imgaug k sampled from (0, 3))."""
    pad = jnp.pad(img, ((1, 1), (1, 1), (0, 0)), mode="edge")
    win = sum(
        pad[dy:dy + img.shape[0], dx:dx + img.shape[1]]
        for dy in range(3) for dx in range(3)
    ) / 9.0
    do = jax.random.bernoulli(key, 2.0 / 3.0)
    return jnp.where(do, win, img)


def dropout(key, img, lo=0.01, hi=0.1, per_channel_p=0.5):
    kp, kc, km, kpc = jax.random.split(key, 4)
    p = jax.random.uniform(kp, (), minval=lo, maxval=hi)
    per_channel = jax.random.bernoulli(kpc, per_channel_p)
    mask_c = jax.random.bernoulli(kc, 1 - p, img.shape)
    mask_s = jax.random.bernoulli(km, 1 - p, img.shape[:2] + (1,))
    mask = jnp.where(per_channel, mask_c, jnp.broadcast_to(mask_s, img.shape))
    return img * mask


def coarse_dropout(key, img, p_hi=0.05, size_lo=0.02, size_hi=0.25):
    kp, ks, km = jax.random.split(key, 3)
    p = jax.random.uniform(kp, (), minval=0.0, maxval=p_hi)
    h, w, c = img.shape
    # fixed coarse grid (16x16), statistically matching size_percent .02-.25
    del size_lo, size_hi
    gh, gw = max(h // 16, 1), max(w // 16, 1)
    low = jax.random.bernoulli(km, 1 - p, (gh, gw, 1))
    mask = jnp.repeat(jnp.repeat(low, h // gh, axis=0), w // gw, axis=1)
    del ks
    return img * mask


def one_of_dropout(key, img):
    """iaa.OneOf([Dropout, CoarseDropout]) with equal probability."""
    kc, kd = jax.random.split(key)
    pick = jax.random.bernoulli(kc, 0.5)
    return jnp.where(pick, dropout(kd, img), coarse_dropout(kd, img))


def geometric(key, img, scale=(0.8, 1.2), translate=0.1, p: float = 0.5):
    """Fused CropAndPad + Affine: one warp with composed parameters.

    The reference applies Sometimes(0.5) CropAndPad then Sometimes(0.5)
    Affine — two sequential resampling passes. Scale/translate affines
    compose in closed form (warp2(warp1(x)) == warp(scale1*scale2,
    t2 + s2*t1)), so one warp produces the same geometry with half the
    resampling cost (and one interpolation instead of two — slightly
    sharper output than imgaug's double-resample; fill colors of the two
    stages collapse into one random cval). Each stage keeps its own
    Sometimes gate by collapsing to identity parameters.
    """
    k1, k2, ks, kt, kp_, kc = jax.random.split(key, 6)
    h, w, _ = img.shape
    # stage 1: crop_and_pad — scale s1 = 1/(1+2p), p ~ U[0, .05]
    pad = jax.random.uniform(kp_, (), minval=0.0, maxval=0.05)
    s1 = 1.0 / (1.0 + 2.0 * pad)
    g1 = jax.random.bernoulli(k1, p)
    s1 = jnp.where(g1, s1, 1.0)
    # stage 2: affine — per-axis scale + translate
    sxy = jax.random.uniform(ks, (2,), minval=scale[0], maxval=scale[1])
    txy = (jax.random.uniform(kt, (2,), minval=-translate, maxval=translate)
           * jnp.array([w, h], jnp.float32))
    g2 = jax.random.bernoulli(k2, p)
    sxy = jnp.where(g2, sxy, 1.0)
    txy = jnp.where(g2, txy, 0.0)
    # composition: total scale = s1*s2 (per axis), total translate = t2
    # (stage-1 has no translation; its scaling happens before t2)
    cval = jax.random.uniform(kc, ())
    return _affine_warp(img, (s1 * sxy[0], s1 * sxy[1]), (txy[0], txy[1]),
                        cval)


def sometimes(op: Callable, p: float = 0.5) -> Callable:
    def wrapped(key, img):
        kg, ko = jax.random.split(key)
        do = jax.random.bernoulli(kg, p)
        return jnp.where(do, op(ko, img), img)

    return wrapped


# -- pipelines mirroring the reference's four Augmenters ----------------------
# every entry handles its own Sometimes gate; the geometric entry fuses the
# reference's CropAndPad + Affine stages into one composed warp

_GAMMA = sometimes(gamma_contrast)
_BRIGHT = sometimes(brightness)
_BLUR = sometimes(average_blur)
_DROP = sometimes(one_of_dropout)
_AFFINE = sometimes(affine)

FULL_OPS = [geometric, _GAMMA, _BRIGHT, _BLUR, _DROP]   # utils/augment.py:22-79
PASCAL_OPS = [geometric, _GAMMA, _BLUR, _DROP]          # utils/augment.py:82-141 (no brightness)
SHAPENET1D_OPS = [geometric, _DROP]                     # dataset/shapenet_1d.py:34-71
DISTRACTOR_OPS = [_AFFINE, _DROP]                       # dataset/shapenet_distractor.py:54-81

PIPELINES = {
    "shapenet_3d": FULL_OPS,
    "pascal_1d": PASCAL_OPS,
    "shapenet_1d": SHAPENET1D_OPS,
    "distractor": DISTRACTOR_OPS,
}


def build_augmenter(task: str, p: float = 0.5) -> Callable:
    """Return ``augment(key, images)`` for [..., H, W, C] image stacks."""
    del p  # gates live inside the ops (geometric fuses two gated stages)
    ops: List[Callable] = list(PIPELINES[task])

    def augment_one(key, img):
        keys = jax.random.split(key, len(ops))
        for k, op in zip(keys, ops):
            img = op(k, img)
        return img

    def augment(key, images):
        batch_shape = images.shape[:-3]
        flat = images.reshape((-1,) + images.shape[-3:])
        keys = jax.random.split(key, flat.shape[0])
        out = jax.vmap(augment_one)(keys, flat)
        return out.reshape(batch_shape + out.shape[-3:])

    return augment
