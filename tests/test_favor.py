"""FAVOR+ attention: einsum path vs exact softmax, Pallas kernel vs einsum."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wmfml_tpu.nn.attention import (
    favor_attention,
    gaussian_orthogonal_random_matrix,
    linear_attention,
    softmax_kernel_features,
)

rng = np.random.RandomState(7)


def exact_softmax_attention(q, k, v, mask=None):
    d = q.shape[-1]
    logits = np.einsum("...nd,...md->...nm", q, k) / np.sqrt(d)
    if mask is not None:
        logits = np.where(mask[..., None, :], logits, -1e30)
    w = np.exp(logits - logits.max(-1, keepdims=True))
    w /= w.sum(-1, keepdims=True)
    return np.einsum("...nm,...me->...ne", w, v)


def test_orthogonal_projection_properties():
    proj = gaussian_orthogonal_random_matrix(jax.random.PRNGKey(0), 256, 64)
    p = np.asarray(proj)
    assert p.shape == (256, 64)
    # rows within each 64-block are orthogonal
    block = p[:64]
    norms = np.linalg.norm(block, axis=1, keepdims=True)
    gram = (block / norms) @ (block / norms).T
    np.testing.assert_allclose(gram, np.eye(64), atol=1e-4)
    # row norms distributed like chi(d) (mean ~ sqrt(d))
    assert abs(np.mean(np.linalg.norm(p, axis=1)) - np.sqrt(64)) < 1.0


def test_favor_approximates_softmax():
    d, m = 32, 512
    q = rng.randn(2, 6, d).astype(np.float32) * 0.5
    k = rng.randn(2, 9, d).astype(np.float32) * 0.5
    v = rng.randn(2, 9, 16).astype(np.float32)
    proj = gaussian_orthogonal_random_matrix(jax.random.PRNGKey(1), m, d)
    got = np.asarray(favor_attention(q, k, v, proj))
    want = exact_softmax_attention(q, k, v)
    # random-feature approximation: loose tolerance, but must correlate
    corr = np.corrcoef(got.ravel(), want.ravel())[0, 1]
    assert corr > 0.98


def test_favor_mask_equals_slicing():
    d, m = 16, 128
    q = rng.randn(3, 4, d).astype(np.float32)
    k = rng.randn(3, 8, d).astype(np.float32)
    v = rng.randn(3, 8, 8).astype(np.float32)
    proj = gaussian_orthogonal_random_matrix(jax.random.PRNGKey(2), m, d)
    mask = np.zeros((3, 8), bool)
    mask[:, :5] = True
    got = np.asarray(favor_attention(q, k, v, proj, mask))
    want = np.asarray(favor_attention(q, k[:, :5], v[:, :5], proj))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)
