"""On-device episode sampling: distribution + mask semantics vs host sampler."""

import jax
import numpy as np

from wmfml_tpu.data.device_sampler import DeviceEpisodeSampler


def make_sampler(gen_bg=False):
    rng = np.random.RandomState(0)
    x = rng.randint(0, 255, size=(6, 12, 16, 16, 4), dtype=np.uint8).astype(
        np.float32) / 255.0
    x[..., 3] = (rng.rand(6, 12, 16, 16) > 0.5).astype(np.float32)
    y = rng.rand(6, 12, 4).astype(np.float32)
    bg = rng.rand(5, 16, 16, 3).astype(np.float32) if gen_bg else None
    return DeviceEpisodeSampler("shapenet_3d", x, y, max_ctx=4, query=5,
                                shot_min=1, bg_images=bg, gen_bg=gen_bg), x, y


def test_sample_shapes_and_mask():
    sampler, x, y = make_sampler()
    b = jax.jit(lambda k: sampler.sample(k, 3))(jax.random.PRNGKey(0))
    assert b["ctx_x"].shape == (3, 4, 16, 16, 4)
    assert b["qry_x"].shape == (3, 5, 16, 16, 4)
    assert b["ctx_y"].shape == (3, 4, 4)
    m = np.asarray(b["ctx_mask"])
    n = m[0].sum()
    assert 1 <= n <= 4
    assert np.all(m.sum(1) == n)          # shared shot per batch (reference)
    assert np.all(m[:, :n]) and not np.any(m[:, n:])  # prefix mask


def test_no_replacement_within_task():
    """ctx+qry instances of a task must be distinct (sampling w/o replacement)."""
    sampler, x, y = make_sampler()
    b = jax.jit(lambda k: sampler.sample(k, 4))(jax.random.PRNGKey(1))
    ys = np.asarray(jnp_concat := np.concatenate(
        [np.asarray(b["ctx_y"]), np.asarray(b["qry_y"])], axis=1))
    for t in range(4):
        rows = [tuple(r) for r in ys[t]]
        assert len(set(rows)) == len(rows)


def test_gathered_pairs_are_consistent():
    """(image, label) must come from the same (group, instance)."""
    sampler, x, y = make_sampler()
    b = jax.jit(lambda k: sampler.sample(k, 5))(jax.random.PRNGKey(2))
    flat_y = y.reshape(-1, 4)
    flat_x = x.reshape(-1, 16, 16, 4)
    for t in range(5):
        for i in range(4):
            label = np.asarray(b["ctx_y"])[t, i]
            matches = np.where(np.all(np.isclose(flat_y, label), axis=1))[0]
            assert len(matches) >= 1
            assert any(np.allclose(np.asarray(b["ctx_x"])[t, i], flat_x[m])
                       for m in matches)


def test_group_choice_roughly_uniform():
    sampler, x, y = make_sampler()
    fn = jax.jit(lambda k: sampler.sample(k, 8))
    counts = np.zeros(6)
    flat_y0 = y[:, :, 0]
    for s in range(60):
        b = fn(jax.random.PRNGKey(100 + s))
        for t in range(8):
            val = float(np.asarray(b["qry_y"])[t, 0, 0])
            g = np.argwhere(np.isclose(flat_y0, val))[0][0]
            counts[g] += 1
    freq = counts / counts.sum()
    assert freq.min() > 0.05 and freq.max() < 0.35  # ~1/6 each


def test_bg_compositing_on_device():
    sampler, x, y = make_sampler(gen_bg=True)
    b = jax.jit(lambda k: sampler.sample(k, 2))(jax.random.PRNGKey(3))
    out = np.asarray(b["ctx_x"])
    # alpha channel preserved; fg pixels (alpha<1) unchanged from source pool
    assert set(np.unique(out[..., 3])) <= {0.0, 1.0}
    # bg pixels replaced: rgb at alpha==1 differs from every source image's
    b2 = jax.jit(lambda k: sampler.sample(k, 2))(jax.random.PRNGKey(4))
    assert not np.allclose(np.asarray(b["ctx_x"])[..., :3],
                           np.asarray(b2["ctx_x"])[..., :3])
