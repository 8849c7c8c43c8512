"""Native C++ episode core vs numpy oracle parity."""

import numpy as np
import pytest

from wmfml_tpu._native import bindings

rng = np.random.RandomState(11)


@pytest.fixture(scope="module")
def lib():
    if not bindings.available():
        pytest.skip("no native lib / compiler")
    return bindings.load()


def test_assemble_uint8_parity(lib):
    data = rng.randint(0, 255, size=(7, 12, 16, 16, 1), dtype=np.uint8)
    items = rng.randint(0, 7, size=5).astype(np.int64)
    perm = np.stack([rng.permutation(12) for _ in range(5)]).astype(np.int64)
    ctx, qry = bindings.assemble_episode(data, items, perm, shot=4, query=6)
    want_ctx = data[items[:, None], perm[:, :4]]
    want_qry = data[items[:, None], perm[:, 4:10]]
    np.testing.assert_array_equal(ctx, want_ctx)
    np.testing.assert_array_equal(qry, want_qry)


def test_assemble_float32_and_eval_offset(lib):
    data = rng.rand(4, 10, 8, 8, 4).astype(np.float32)
    items = np.array([2, 0, 3], np.int64)
    perm = np.stack([rng.permutation(10) for _ in range(3)]).astype(np.int64)
    # eval mode: query = all views from perm[0]
    ctx, qry = bindings.assemble_episode(data, items, perm, shot=3, query=10,
                                         query_offset=-1)
    np.testing.assert_array_equal(ctx, data[items[:, None], perm[:, :3]])
    np.testing.assert_array_equal(qry, data[items[:, None], perm])


def test_assemble_rejects_overflow(lib):
    data = rng.rand(2, 5, 4).astype(np.float32)
    items = np.zeros(1, np.int64)
    perm = np.arange(5, dtype=np.int64)[None]
    with pytest.raises(ValueError):
        bindings.assemble_episode(data, items, perm, shot=3, query=4)


def test_composite_backgrounds_parity(lib):
    imgs = rng.rand(6, 8, 8, 4).astype(np.float32)
    imgs[..., 3] = (rng.rand(6, 8, 8) > 0.5).astype(np.float32)  # 1 = bg
    bg = rng.rand(3, 8, 8, 3).astype(np.float32)
    bg_idx = rng.randint(0, 3, size=6).astype(np.int64)

    want = imgs.copy()
    mask = (want[..., 3] < 1.0)[..., None]
    want[..., :3] = want[..., :3] * mask + bg[bg_idx] * (1 - mask)

    got = imgs.copy()
    bindings.composite_backgrounds(got, bg, bg_idx)
    np.testing.assert_allclose(got, want, atol=1e-7)


def test_threading_consistency(lib):
    data = rng.randint(0, 255, size=(20, 30, 64, 64, 1), dtype=np.uint8)
    items = rng.randint(0, 20, size=16).astype(np.int64)
    perm = np.stack([rng.permutation(30) for _ in range(16)]).astype(np.int64)
    c1, q1 = bindings.assemble_episode(data, items, perm, 5, 10, n_threads=1)
    c8, q8 = bindings.assemble_episode(data, items, perm, 5, 10, n_threads=8)
    np.testing.assert_array_equal(c1, c8)
    np.testing.assert_array_equal(q1, q8)
