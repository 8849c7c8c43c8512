"""Device augmentation kernels: semantics and the separable-warp rewrite."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wmfml_tpu.aug.image_aug import (
    _affine_warp,
    brightness,
    build_augmenter,
    coarse_dropout,
    dropout,
    gamma_contrast,
)

rng = np.random.RandomState(3)


def oracle_warp(img, scale_xy, translate_xy, cval):
    """Straightforward per-pixel bilinear gather with per-tap cval fill."""
    h, w, c = img.shape
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    sx, sy = scale_xy
    tx, ty = translate_xy
    out = np.zeros_like(img, dtype=np.float64)
    for i in range(h):
        for j in range(w):
            sy_ = (i - cy - ty) / sy + cy
            sx_ = (j - cx - tx) / sx + cx
            y0, x0 = int(np.floor(sy_)), int(np.floor(sx_))
            fy, fx = sy_ - y0, sx_ - x0
            acc = np.zeros(c)
            for dy, wy_ in ((0, 1 - fy), (1, fy)):
                for dx, wx_ in ((0, 1 - fx), (1, fx)):
                    yy, xx = y0 + dy, x0 + dx
                    v = (img[yy, xx] if 0 <= yy < h and 0 <= xx < w
                         else np.full(c, cval))
                    acc += wy_ * wx_ * v
            out[i, j] = acc
    return out


@pytest.mark.parametrize("scale,translate", [
    ((1.0, 1.0), (0.0, 0.0)),
    ((0.85, 1.15), (3.7, -5.2)),
    ((1.2, 0.8), (-10.0, 6.5)),
])
def test_separable_warp_matches_gather_oracle(scale, translate):
    img = rng.rand(24, 20, 1).astype(np.float32)
    cval = 0.3
    got = np.asarray(_affine_warp(jnp.asarray(img), scale, translate, cval))
    want = oracle_warp(img, scale, translate, cval)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_identity_warp_is_identity():
    img = rng.rand(16, 16, 3).astype(np.float32)
    out = np.asarray(_affine_warp(jnp.asarray(img), (1.0, 1.0), (0.0, 0.0),
                                  0.0))
    np.testing.assert_allclose(out, img, atol=1e-6)


def test_gamma_and_brightness_ranges():
    img = jnp.asarray(rng.rand(8, 8, 1), jnp.float32)
    g = np.asarray(gamma_contrast(jax.random.PRNGKey(0), img))
    assert g.min() >= 0 and g.max() <= 1
    b = np.asarray(brightness(jax.random.PRNGKey(1), img))
    assert b.min() >= 0 and b.max() <= 1


def test_dropout_fraction():
    img = jnp.ones((64, 64, 1), jnp.float32)
    out = np.asarray(dropout(jax.random.PRNGKey(2), img, lo=0.1, hi=0.1))
    frac = 1 - out.mean()
    assert 0.05 < frac < 0.15
    out = np.asarray(coarse_dropout(jax.random.PRNGKey(3), img))
    assert 0 <= 1 - out.mean() < 0.2


def test_augmenter_preserves_shape_and_range():
    aug = build_augmenter("shapenet_3d")
    imgs = jnp.asarray(rng.rand(2, 3, 64, 64, 3), jnp.float32)
    out = np.asarray(aug(jax.random.PRNGKey(4), imgs))
    assert out.shape == imgs.shape
    assert np.isfinite(out).all()
    # different keys -> different augmentations
    out2 = np.asarray(aug(jax.random.PRNGKey(5), imgs))
    assert not np.allclose(out, out2)


def test_geometric_composes_two_warps():
    """Composed warp == sequential warps when no fill pixels interact."""
    from wmfml_tpu.aug.image_aug import geometric

    # smooth image (white noise decorrelates under any resampling)
    yy, xx = np.mgrid[0:32, 0:32] / 32.0
    img = jnp.asarray((np.sin(4 * yy) * np.cos(3 * xx) * 0.5 + 0.5)[..., None],
                      jnp.float32)
    # zoom-in params (scale > 1): no constant fill is sampled by either stage
    s1, sxy, txy = 1.25, (1.1, 1.15), (1.5, -2.0)
    seq = _affine_warp(_affine_warp(img, (s1, s1), (0.0, 0.0), 0.5),
                       sxy, txy, 0.5)
    comp = _affine_warp(img, (s1 * sxy[0], s1 * sxy[1]), txy, 0.5)
    # double resampling blurs slightly; compare against a generous tol and
    # verify the composed warp is geometrically aligned (high correlation)
    a, b = np.asarray(seq).ravel(), np.asarray(comp).ravel()
    assert np.corrcoef(a, b)[0, 1] > 0.99
    # the op itself runs and gates correctly
    out = geometric(jax.random.PRNGKey(0), img)
    assert out.shape == img.shape and np.isfinite(np.asarray(out)).all()
