"""Quaternion algebra vs scipy.spatial.transform oracle."""

import numpy as np
from scipy.spatial.transform import Rotation as R

from wmfml_tpu.utils import (
    euler_zyx_to_quat,
    quat_canonicalize,
    quat_mul,
    quat_to_euler_zyx,
    task_augment_quat,
)

rng = np.random.RandomState(1)


def random_quats(*shape):
    q = rng.randn(*shape, 4)
    return (q / np.linalg.norm(q, axis=-1, keepdims=True)).astype(np.float64)


def quats_close(a, b, atol=1e-5):
    """Equal up to global sign (q and -q are the same rotation)."""
    a, b = np.asarray(a), np.asarray(b)
    return np.all(
        np.minimum(np.abs(a - b).max(-1), np.abs(a + b).max(-1)) < atol
    )


def test_quat_mul_matches_scipy():
    q1, q2 = random_quats(10), random_quats(10)
    want = (R.from_quat(q1) * R.from_quat(q2)).as_quat()
    got = np.asarray(quat_mul(q1, q2))
    assert quats_close(got, want)


def test_euler_roundtrip_matches_scipy():
    e = rng.uniform(-80, 80, size=(20, 3))
    want = R.from_euler("ZYX", e, degrees=True).as_quat()
    got = np.asarray(euler_zyx_to_quat(e))
    assert quats_close(got, want)

    q = random_quats(20)
    want_e = R.from_quat(q).as_euler("ZYX", degrees=True)
    got_e = np.asarray(quat_to_euler_zyx(q))
    assert np.allclose(got_e, want_e, atol=1e-4)


def scipy_task_augment(q, noise_ele, noise_azi):
    """Literal reference semantics (utils/utils.py:44-48)."""
    e = R.from_quat(q).as_euler("ZYX", degrees=True)
    e[:, 0] += noise_ele
    e[:, 2] -= noise_azi
    return R.from_euler("ZYX", e, degrees=True).as_quat()


def test_task_augment_matches_reference_euler_roundtrip():
    for _ in range(5):
        q = random_quats(8)
        ele = float(rng.randint(-5, 10))
        azi = float(rng.randint(-10, 20))
        want = scipy_task_augment(q.copy(), ele, azi)
        got = np.asarray(task_augment_quat(q, ele, azi))
        assert quats_close(got, want, atol=1e-5)


def test_task_augment_batched():
    q = random_quats(4, 8)  # [tasks, n, 4]
    ele = rng.randint(-5, 10, size=(4,)).astype(np.float64)
    azi = rng.randint(-10, 20, size=(4,)).astype(np.float64)
    got = np.asarray(task_augment_quat(q, ele, azi))
    for t in range(4):
        want = scipy_task_augment(q[t].copy(), ele[t], azi[t])
        assert quats_close(got[t], want)


def test_canonicalize():
    q = random_quats(30)
    out = np.asarray(quat_canonicalize(q))
    assert np.all(out[:, 1] >= 0)
    # same rotation
    assert quats_close(out, q)
