"""Device-side image augmentation (replaces the reference's CPU imgaug path).

The reference runs imgaug pipelines synchronously on host every iteration
(`utils/augment.py:22-79` — its #1 input bottleneck). Here every op is a
jittable jnp transform on [B, H, W, C] float images in [0, 1], vmapped over
the batch with per-image PRNG keys, so augmentation fuses into the training
step and costs ~nothing against the conv trunks.

Op semantics mirror imgaug's (parameter ranges from the reference pipelines;
uint8-scale constants rescaled to [0, 1]):

  * crop_and_pad   — iaa.CropAndPad(percent=(0, .05), keep_size=True):
                     four independent per-side pad fractions
                     (sample_independently default), then resize back ==
                     closed-form scale+translate affine
  * affine         — iaa.Affine(scale .8-1.2 per axis, translate +/-10%,
                     order=[0, 1]: nearest/bilinear picked per image)
  * gamma_contrast — iaa.GammaContrast(.5-2)
  * brightness     — iaa.AddToBrightness(-30..30) / 255
  * average_blur   — iaa.AverageBlur(k=(1, 3)): k ~ U{1, 2, 3} mean filter
  * dropout        — iaa.Dropout(.01-.1, per_channel=.5)
  * coarse_dropout — iaa.CoarseDropout((0, .05), size_percent=(.02, .25),
                     per_channel=.2) with the size_percent SAMPLED per image
                     (per-pixel keyed hash of the low-res cell id == one iid
                     draw per cell, nearest-upsampled, fully elementwise)

Each is wrapped in ``sometimes(0.5)`` per image, and — like the reference's
``iaa.Sequential(random_order=True)`` (`utils/augment.py:61-63`), which
draws a new op order per BATCH — the op order is sampled per augmenter call
and applied via a scalar-index ``lax.switch`` chain, so exactly one op body
executes per step at runtime.

Remaining (documented) approximations, RNG-stream-level only:
  * pad_mode=ia.ALL / cval=(0, 255) — a random CONSTANT fill approximates
    imgaug's random pad mode (edge/reflect/wrap/... are a rare subset);
  * the reference round-trips through uint8 around the pipeline
    ((x*255).astype(uint8) / 255, `utils/augment.py:67-71`) — we stay in
    float (no quantization);
  * CropAndPad(keep_size=True)'s resize-back uses cubic interpolation in
    imgaug; our closed-form warp is bilinear (the crop/pad itself is exact
    either way — only the resample filter differs);
  * AddToBrightness offsets HSV-V in closed form; imgaug samples the
    brightness colorspace per image from {YCrCb, HSV, HSL, Lab, Luv, YUV}
    (HSV is one draw of six; the others are near-identical V-like offsets);
  * exact per-draw RNG streams differ by construction (different PRNG).
Tests assert distributional properties (tests/test_aug.py).
"""

from __future__ import annotations

from typing import Callable, List

import jax
import jax.numpy as jnp


def _interp_matrix(n: int, src: jnp.ndarray) -> jnp.ndarray:
    """[n, n] bilinear interpolation matrix: row i mixes input taps for
    output position i sampling at ``src[i]``; out-of-range taps get zero
    weight (their mass is filled with cval by the caller).

    Tent form: A[i, j] = relu(1 - |src_i - j|). For j = floor(src):
    1 - |src - j| = 1 - frac; for j = floor(src)+1: 1 - (j - src) = frac;
    0 elsewhere — identical to the two-one-hot construction (out-of-range
    taps vanish because j only ranges over [0, n)), at 4 VPU ops/element
    instead of ~9. The roofline measured interp-matrix construction as the
    largest latency-bound block of the exact-aug chain (2x ~100 us/step,
    results/profiles/roofline_exact.json)."""
    j = jnp.arange(n, dtype=jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(src[:, None] - j[None, :]))


def _stage_matrices(h: int, w: int, scale_xy, translate_xy, nearest=None,
                    gate=None):
    """Per-axis interpolation matrices (wy [H,H], wx [W,W]) of one
    scale/translate warp; ``gate`` (traced bool) collapses the stage to
    identity (the Sometimes(0.5) off-branch)."""
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    sx, sy = scale_xy
    tx, ty = translate_xy
    src_y = (jnp.arange(h, dtype=jnp.float32) - cy - ty) / sy + cy
    src_x = (jnp.arange(w, dtype=jnp.float32) - cx - tx) / sx + cx
    if nearest is not None:
        src_y = jnp.where(nearest, jnp.floor(src_y + 0.5), src_y)
        src_x = jnp.where(nearest, jnp.floor(src_x + 0.5), src_x)
    if gate is not None:
        # identity == tent matrix of src=arange, so the off-branch is an
        # [n] select on the coordinates instead of an [n, n] select on the
        # built matrices
        src_y = jnp.where(gate, src_y, jnp.arange(h, dtype=jnp.float32))
        src_x = jnp.where(gate, src_x, jnp.arange(w, dtype=jnp.float32))
    wy = _interp_matrix(h, src_y)                      # [H, H]
    wx = _interp_matrix(w, src_x)                      # [W, W]
    return wy, wx


def _affine_warp(img: jnp.ndarray, scale_xy, translate_xy, cval,
                 nearest=None) -> jnp.ndarray:
    """Bilinear (or nearest) affine warp about the image center w/ constant
    fill.

    img [H, W, C]; scale/translate are (x, y) tuples; output pixel (x, y)
    samples input at center + (x - center - tx) / sx. ``nearest`` (traced
    bool or None) switches to order-0 interpolation by snapping the source
    coordinates to the pixel grid (iaa.Affine order=[0, 1]).

    Scale+translate is separable, so the warp is two small matmuls
    (row-mix then column-mix) — MXU work instead of the double gather XLA
    would emit for coordinate indexing. Constant fill is applied via the
    interpolation matrices' missing mass (exactly per-tap cval semantics).
    """
    h, w, _ = img.shape
    wy, wx = _stage_matrices(h, w, scale_xy, translate_xy, nearest)
    out = jnp.einsum("ih,hwc,jw->ijc", wy, img.astype(jnp.float32), wx,
                     preferred_element_type=jnp.float32)
    coverage = (jnp.sum(wy, axis=1)[:, None] * jnp.sum(wx, axis=1)[None, :])
    return (out + cval * (1.0 - coverage)[:, :, None]).astype(img.dtype)


def _warp_chain(img: jnp.ndarray, stages) -> jnp.ndarray:
    """Sequential scale/translate warps applied in ONE image mix — exact.

    ``stages`` is a list of dicts {scale, translate, cval, nearest?, gate?}
    applied first-to-last. Per-axis interpolation matrices compose by
    matmul ((W2 @ W1) img == W2 (W1 img) up to fp association), and each
    stage's constant-fill field cval·(1⊗1 − ry⊗rx) stays a sum of per-axis
    outer products under later stages (W2y a ⊗ W2x b), so the composed
    result equals running _affine_warp stage-by-stage to fp-association
    precision — same double-resample math, half the image-mixing passes
    (the reference pays a full resample per op: utils/augment.py:34-63).
    """
    h, w, _ = img.shape
    My = Mx = None
    terms = []  # rank-1 fill contributions: (coeff, a [H], b [W])
    for st in stages:
        wy, wx = _stage_matrices(h, w, st["scale"], st["translate"],
                                 st.get("nearest"), st.get("gate"))
        ry, rx = jnp.sum(wy, axis=1), jnp.sum(wx, axis=1)
        terms = [(c, wy @ a, wx @ b) for (c, a, b) in terms]
        cval = st["cval"]
        terms.append((cval, jnp.ones(h, jnp.float32),
                      jnp.ones(w, jnp.float32)))
        terms.append((-cval, ry, rx))
        My = wy if My is None else wy @ My
        Mx = wx if Mx is None else wx @ Mx
    out = jnp.einsum("ih,hwc,jw->ijc", My, img.astype(jnp.float32), Mx,
                     preferred_element_type=jnp.float32)
    fill = jnp.zeros((h, w), jnp.float32)
    for c, a, b in terms:
        fill = fill + c * (a[:, None] * b[None, :])
    return (out + fill[:, :, None]).astype(img.dtype)


def _sample_crop_params(key, h, w, lo=0.0, hi=0.05):
    """Parameter draw shared by crop_and_pad and its composable stage form."""
    kp, kc = jax.random.split(key)
    p = jax.random.uniform(kp, (4,), minval=lo, maxval=hi)
    pt, pr, pb, pl = p[0], p[1], p[2], p[3]
    sx = 1.0 / (1.0 + pl + pr)
    sy = 1.0 / (1.0 + pt + pb)
    tx = sx * w * (pl - pr) / 2.0
    ty = sy * h * (pt - pb) / 2.0
    cval = jax.random.uniform(kc, ())
    return (sx, sy), (tx, ty), cval, None


def _sample_affine_params(key, h, w, scale=(0.8, 1.2), translate=0.1):
    ks, kt, kc, ko = jax.random.split(key, 4)
    sxy = jax.random.uniform(ks, (2,), minval=scale[0], maxval=scale[1])
    txy = jax.random.uniform(kt, (2,), minval=-translate, maxval=translate)
    txy = txy * jnp.array([w, h], jnp.float32)
    cval = jax.random.uniform(kc, ())
    nearest = jax.random.bernoulli(ko, 0.5)  # iaa order=[0, 1]
    return (sxy[0], sxy[1]), (txy[0], txy[1]), cval, nearest


def crop_and_pad(key, img, lo=0.0, hi=0.05):
    """iaa.CropAndPad(percent=(0, .05), keep_size=True).

    imgaug samples each side independently (sample_independently defaults
    True): pad fractions (top, right, bottom, left), then resizes back to
    the original size — which is exactly an affine with per-axis scale
    1/(1+p_left+p_right) and translate moving content toward the
    more-padded side."""
    h, w, _ = img.shape
    s, t, cval, _ = _sample_crop_params(key, h, w, lo, hi)
    return _affine_warp(img, s, t, cval)


def affine(key, img, scale=(0.8, 1.2), translate=0.1):
    h, w, _ = img.shape
    s, t, cval, nearest = _sample_affine_params(key, h, w, scale, translate)
    return _affine_warp(img, s, t, cval, nearest=nearest)


def _crop_stage(key, h, w, p_gate=0.5):
    """crop_and_pad + its Sometimes(0.5) gate as a composable warp stage."""
    kg, ko = jax.random.split(key)
    s, t, cval, nearest = _sample_crop_params(ko, h, w)
    return dict(scale=s, translate=t, cval=cval, nearest=nearest,
                gate=jax.random.bernoulli(kg, p_gate))


def _affine_stage(key, h, w, p_gate=0.5):
    kg, ko = jax.random.split(key)
    s, t, cval, nearest = _sample_affine_params(ko, h, w)
    return dict(scale=s, translate=t, cval=cval, nearest=nearest,
                gate=jax.random.bernoulli(kg, p_gate))


def gamma_contrast(key, img, lo=0.5, hi=2.0):
    gamma = jax.random.uniform(key, (), minval=lo, maxval=hi)
    # compute in f32, return in img.dtype: every op must preserve dtype so
    # the random-order lax.switch branches agree (bf16 pipelines)
    out = jnp.clip(img.astype(jnp.float32), 1e-6, 1.0) ** gamma
    return out.astype(img.dtype)


def brightness(key, img, amount=30.0 / 255.0):
    """iaa.AddToBrightness(-30..30): offset the brightness channel.

    imgaug converts to a brightness-carrying colorspace, adds, and converts
    back. For RGB we use the HSV closed form: V = max(R, G, B); offsetting
    V with H, S fixed scales all channels by clip(V + b) / V (an S=0 pixel
    degenerates to the gray clip(V + b), which the scaling form also
    yields). Grayscale is the V channel itself, so the offset is a plain
    add — identical to the RGB formula at R=G=B. Residual deviation
    (documented in the module docstring): imgaug samples the colorspace
    per image from {YCrCb, HSV, HSL, Lab, Luv, YUV}; we always use HSV."""
    b = jax.random.uniform(key, (), minval=-amount, maxval=amount)
    if img.shape[-1] == 1:
        return jnp.clip(img + b, 0.0, 1.0).astype(img.dtype)
    xf = img.astype(jnp.float32)
    v = jnp.max(xf, axis=-1, keepdims=True)
    scale = jnp.where(v > 1e-6, jnp.clip(v + b, 0.0, 1.0) / jnp.maximum(v, 1e-6),
                      0.0)
    # V==0 (pure black): S is 0 by convention, HSV->RGB gives the gray V'
    out = jnp.where(v > 1e-6, xf * scale,
                    jnp.clip(jnp.zeros_like(xf) + jnp.maximum(b, 0.0), 0.0, 1.0))
    return out.astype(img.dtype)


def average_blur(key, img):
    """iaa.AverageBlur(k=(1, 3)): k ~ U{1, 2, 3}; k=1 is identity.

    k=2 anchors like cv2.blur's even-kernel anchor (pixel + its top/left
    neighbors)."""
    k = jax.random.randint(key, (), 1, 4)
    h, w = img.shape[:2]
    pad = jnp.pad(img, ((1, 1), (1, 1), (0, 0)), mode="edge")
    win3 = sum(
        pad[dy:dy + h, dx:dx + w] for dy in range(3) for dx in range(3)
    ) / 9.0
    win2 = sum(
        pad[dy:dy + h, dx:dx + w] for dy in range(2) for dx in range(2)
    ) / 4.0
    return jnp.where(k == 3, win3, jnp.where(k == 2, win2, img))


# -- hash-based mask bits ------------------------------------------------------
# jax.random.bernoulli over full-resolution dropout masks lowers to a threefry
# chain whose ~30 intermediate [H,W] u32 arrays XLA materializes in HBM when
# the consumer fusion can't absorb them (measured on the ANP-1D aug chain:
# ~0.9 ms/application of materialized RNG traffic at ~650 GB/s, plus 0.64 ms
# for the one-hot upsample einsum that forced the materialization — RESULTS.md
# round-4 aug section). Mask bits don't need a counter-based CSPRNG: a keyed
# murmur3-style integer mix of the pixel/cell index yields
# iid-to-statistical-precision Bernoulli bits as a single elementwise
# expression that fuses into the mask multiply (zero extra HBM traffic).
# The mask DISTRIBUTION (iid per pixel/cell, optional per-channel) is
# unchanged; only the RNG stream differs, which is already a documented
# deviation. Distribution tests: tests/test_aug.py.

_GOLDEN = jnp.uint32(0x9E3779B9)


def _fmix32(x):
    """murmur3 32-bit finalizer (full avalanche)."""
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    return x


def _hash_keep(key, ids, p_drop):
    """iid Bernoulli(1 - p_drop) keep bits per unique id, keyed by `key`.

    `key` is a (2,) uint32 PRNG key array (its words salt the hash), `ids`
    any uint32 array of distinct ids, `p_drop` a traced scalar in [0, 1].
    The hashed word is compared as a [0, 1) uniform at f32 resolution —
    the same effective resolution as jax.random.uniform's f32 path.
    """
    x = (ids ^ key[0]) * _GOLDEN + key[1]
    x = _fmix32(_fmix32(x))
    u = x.astype(jnp.float32) * jnp.float32(2.0 ** -32)
    return u >= p_drop


def dropout(key, img, lo=0.01, hi=0.1, per_channel_p=0.5):
    kp, km, kpc = jax.random.split(key, 3)
    p = jax.random.uniform(kp, (), minval=lo, maxval=hi)
    per_channel = jax.random.bernoulli(kpc, per_channel_p)
    h, w, c = img.shape
    yx = (jax.lax.broadcasted_iota(jnp.uint32, (h, w, 1), 0) * jnp.uint32(w)
          + jax.lax.broadcasted_iota(jnp.uint32, (h, w, 1), 1))
    ch = jax.lax.broadcasted_iota(jnp.uint32, (1, 1, c), 2)
    # per_channel: distinct id per (y, x, ch); else channels share the id
    ids = jnp.where(per_channel, yx * jnp.uint32(c) + ch,
                    jnp.broadcast_to(yx, (h, w, c)))
    keep = _hash_keep(km, ids, p)
    return img * keep.astype(img.dtype)


def coarse_dropout(key, img, p_hi=0.05, size_lo=0.02, size_hi=0.25,
                   per_channel_p=0.2):
    """iaa.CoarseDropout((0, .05), size_percent=(.02, .25), per_channel=.2).

    imgaug samples size_percent per image, draws an iid Bernoulli mask on
    the (h*sp, w*sp) grid and nearest-upsamples it. Data-dependent low-res
    shapes can't exist under jit, so instead every full-res pixel computes
    its low-res CELL id and hashes (key, id) into a keep decision
    (_hash_keep): pixels in the same cell share the draw, distinct cells
    are iid Bernoulli — the same mask distribution as materializing the
    (h*sp, w*sp) grid and nearest-upsampling, with static shapes and no
    materialized RNG intermediates.
    """
    kp, ks, km, kpc = jax.random.split(key, 4)
    h, w, c = img.shape
    p = jax.random.uniform(kp, (), minval=0.0, maxval=p_hi)
    sp = jax.random.uniform(ks, (), minval=size_lo, maxval=size_hi)
    hl = jnp.maximum(jnp.round(h * sp), 1.0)   # low-res dims actually used
    wl = jnp.maximum(jnp.round(w * sp), 1.0)
    # one iid Bernoulli draw per low-res CELL, nearest-upsampled: every pixel
    # hashes its cell id, so pixels in the same cell share the draw and
    # distinct cells are iid — identical distribution to drawing a (hl, wl)
    # grid and upsampling, with no gather (a traced-index gather vmapped over
    # the batch lowered to ~61 ms/step on v5e) and no one-hot matmul (whose
    # conv fusion materialized every RNG intermediate — see _hash_keep note)
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w, 1), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w, 1), 1)
    cell = (jnp.floor(ys * hl / h) * w + jnp.floor(xs * wl / w)
            ).astype(jnp.uint32)
    if c == 1:
        ids = cell
    else:
        per_channel = jax.random.bernoulli(kpc, per_channel_p)
        ch = jax.lax.broadcasted_iota(jnp.uint32, (1, 1, c), 2)
        ids = jnp.where(per_channel, cell * jnp.uint32(c) + ch,
                        jnp.broadcast_to(cell, (h, w, c)))
    keep = _hash_keep(km, ids, p)
    return img * keep.astype(img.dtype)


def coarse_dropout_fixed(key, img, p_hi=0.05):
    """Fixed 16-px-grid CoarseDropout — the perf-pipeline approximation
    (round-2 behavior): drop prob sampled, grid size NOT (statistically
    inside imgaug's size_percent .02-.25 range). Kept for the fused
    fixed-order pipelines, where the sampled-size form measured
    +0.77 ms/step on the ANP-1D headline (RESULTS.md round 3)."""
    kp, km = jax.random.split(key)
    p = jax.random.uniform(kp, (), minval=0.0, maxval=p_hi)
    h, w, c = img.shape
    gh, gw = max(h // 16, 1), max(w // 16, 1)
    low = jax.random.bernoulli(km, 1 - p, (gh, gw, 1))
    mask = jnp.repeat(jnp.repeat(low, h // gh, axis=0), w // gw, axis=1)
    return img * mask


def one_of_dropout(key, img):
    """iaa.OneOf([Dropout, CoarseDropout]) with equal probability."""
    kc, kd = jax.random.split(key)
    pick = jax.random.bernoulli(kc, 0.5)
    return jnp.where(pick, dropout(kd, img), coarse_dropout(kd, img))


def one_of_dropout_fixed(key, img):
    """Perf-pipeline variant: fixed-grid CoarseDropout (see
    coarse_dropout_fixed)."""
    kc, kd = jax.random.split(key)
    pick = jax.random.bernoulli(kc, 0.5)
    return jnp.where(pick, dropout(kd, img), coarse_dropout_fixed(kd, img))


def geometric(key, img, scale=(0.8, 1.2), translate=0.1, p: float = 0.5):
    """Fused CropAndPad + Affine: one warp with composed parameters.

    Perf variant (``random_order=False`` pipelines only): the reference
    applies Sometimes(0.5) CropAndPad then Sometimes(0.5) Affine — two
    sequential resampling passes. Scale/translate affines compose in closed
    form (warp2(warp1(x)) == warp(scale1*scale2, t2 + s2*t1)), so one warp
    produces the same geometry with half the resampling cost (and one
    interpolation instead of two — slightly sharper output than imgaug's
    double-resample; fill colors of the two stages collapse into one random
    cval; the crop stage is symmetric). Each stage keeps its own Sometimes
    gate by collapsing to identity parameters.
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
# every entry handles its own Sometimes gate

_CROP = sometimes(crop_and_pad)
_AFFINE = sometimes(affine)
_GAMMA = sometimes(gamma_contrast)
_BRIGHT = sometimes(brightness)
_BLUR = sometimes(average_blur)
_DROP = sometimes(one_of_dropout)

# exact op lists, reference declaration order (the random-order chain
# permutes them per call, like iaa.Sequential(random_order=True))
FULL_OPS = [_CROP, _GAMMA, _BRIGHT, _BLUR, _AFFINE, _DROP]  # utils/augment.py:34-60
PASCAL_OPS = [_CROP, _GAMMA, _BLUR, _AFFINE, _DROP]         # utils/augment.py:82-141 (no brightness)
SHAPENET1D_OPS = [_CROP, _AFFINE, _DROP]                    # dataset/shapenet_1d.py:34-71
DISTRACTOR_OPS = [_AFFINE, _DROP]                           # dataset/shapenet_distractor.py:54-81

PIPELINES = {
    "shapenet_3d": FULL_OPS,
    "pascal_1d": PASCAL_OPS,
    "shapenet_1d": SHAPENET1D_OPS,
    "distractor": DISTRACTOR_OPS,
}

# fixed-order perf variant: CropAndPad + Affine fused into ONE warp (half
# the resampling cost; order deviation documented in geometric()) and the
# fixed-grid CoarseDropout (coarse_dropout_fixed)
_DROP_FIXED = sometimes(one_of_dropout_fixed)
FUSED_PIPELINES = {
    "shapenet_3d": [geometric, _GAMMA, _BRIGHT, _BLUR, _DROP_FIXED],
    "pascal_1d": [geometric, _GAMMA, _BLUR, _DROP_FIXED],
    "shapenet_1d": [geometric, _DROP_FIXED],
    "distractor": [_AFFINE, _DROP_FIXED],
}

# warp ops whose (op + Sometimes gate) has an exact composable stage form —
# adjacent runs of these in a sampled order collapse into one _warp_chain
# mix (same double-resample math; see _warp_chain)
_STAGE_SAMPLERS = {_CROP: _crop_stage, _AFFINE: _affine_stage}

# permutation-enumeration cutoff for the exact random-order path: n! fused
# branches compile per augmenter, so cap at 3! = 6 (covers shapenet_1d and
# distractor — the 128x128 pipelines where the warp passes dominate)
_ENUM_MAX = 3


def build_augmenter(task: str, p: float = 0.5,
                    random_order: bool = True,
                    ops: List[Callable] = None) -> Callable:
    """Return ``augment(key, images)`` for [..., H, W, C] image stacks.

    ``random_order=True`` (default, exact reference semantics): the op
    order is drawn per call — imgaug's Sequential(random_order=True)
    resamples the order per batch, and the reference augments each batch
    with one ``generate()`` call (`dataset/shapenet_1d.py:174-176`).
    Pipelines with <= _ENUM_MAX ops compile one fused branch per
    permutation behind a single scalar lax.switch (adjacent warp ops
    composed exactly — see _warp_chain); longer pipelines run the per-step
    scalar-switch chain, one op body per step. ``random_order=False``
    selects the fused fixed-order perf pipelines.
    """
    del p  # gates live inside the ops
    if ops is None:
        ops = list((PIPELINES if random_order else FUSED_PIPELINES)[task])
    n = len(ops)

    def batch_op(op):
        def run(k, imgs):
            keys = jax.random.split(k, imgs.shape[0])
            return jax.vmap(op)(keys, imgs)

        return run

    def chain_one(key, img):
        # fixed order: ONE vmap over the whole chain (a single per-image
        # key split; the per-step vmap form measured ~1.9 ms/step slower)
        keys = jax.random.split(key, n)
        for k, op in zip(keys, ops):
            img = op(k, img)
        return img

    def perm_chain(perm):
        """Fully-fused chain for one fixed op order: maximal runs of
        composable warp ops collapse into ONE _warp_chain mix (exact, see
        _warp_chain); everything else applies in place. Per-image:
        step_keys [n, 2] indexed by chain POSITION (the per-step key
        assignment of the switch-chain form)."""
        def chain(step_keys, img):
            h, w = img.shape[:2]
            i = 0
            while i < n:
                run = []
                while (i + len(run) < n
                       and ops[perm[i + len(run)]] in _STAGE_SAMPLERS):
                    run.append(perm[i + len(run)])
                if len(run) >= 2:
                    stages = [
                        _STAGE_SAMPLERS[ops[run_op]](step_keys[i + t], h, w)
                        for t, run_op in enumerate(run)]
                    img = _warp_chain(img, stages)
                    i += len(run)
                else:
                    img = ops[perm[i]](step_keys[i], img)
                    i += 1
            return img

        return chain

    if random_order and n <= _ENUM_MAX:
        # exact random-order via ONE batch-level switch over all n!
        # orders, each branch a fully-fused vmapped chain — instead of n
        # sequential batch-wide switch steps (n batch materializations, no
        # cross-op fusion). Order distribution is identical: uniform over
        # the n! permutations, shared across the batch.
        import itertools
        import math

        perms = list(itertools.permutations(range(n)))
        chains = [perm_chain(perm) for perm in perms]
        n_perms = math.factorial(n)

        def augment(key, images):
            batch_shape = images.shape[:-3]
            flat = images.reshape((-1,) + images.shape[-3:])
            kperm, kops = jax.random.split(key)
            idx = jax.random.randint(kperm, (), 0, n_perms)
            step_keys = jax.random.split(kops, n)             # [n, 2]
            img_keys = jax.vmap(
                lambda k: jax.random.split(k, flat.shape[0]))(step_keys)
            img_keys = jnp.swapaxes(img_keys, 0, 1)           # [B, n, 2]
            branches = [
                (lambda ch: lambda ks, im: jax.vmap(ch)(ks, im))(ch)
                for ch in chains]
            flat = jax.lax.switch(idx, branches, img_keys, flat)
            return flat.reshape(batch_shape + flat.shape[-3:])

        return augment

    branches = [batch_op(op) for op in ops]

    def augment(key, images):
        batch_shape = images.shape[:-3]
        flat = images.reshape((-1,) + images.shape[-3:])
        if random_order:
            kperm, kops = jax.random.split(key)
            step_keys = jax.random.split(kops, n)
            perm = jax.random.permutation(kperm, n)
            for s in range(n):
                flat = jax.lax.switch(perm[s], branches, step_keys[s], flat)
        else:
            keys = jax.random.split(key, flat.shape[0])
            flat = jax.vmap(chain_one)(keys, flat)
        return flat.reshape(batch_shape + flat.shape[-3:])

    return augment
