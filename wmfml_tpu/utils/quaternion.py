"""Quaternion algebra in jnp (scipy ``xyzw`` component order).

The reference performs ShapeNet3D task augmentation on the host with scipy:
decompose each quaternion to intrinsic 'ZYX' Euler angles, add per-task noise
to the Z angle (elevation) and subtract noise from the X angle (azimuth), then
recompose (`/root/reference/utils/utils.py:33-58`).

We exploit the algebraic identity instead of an Euler round-trip: with
R = Rz(a) Ry(b) Rx(c),
    a -> a + d_z  ==>  R' = Rz(d_z) . R      (left-compose)
    c -> c + d_x  ==>  R' = R . Rx(d_x)      (right-compose)
so the whole augmentation is two quaternion products — exact, branch-free,
vmappable over (task, instance), and runnable on device.
"""

from __future__ import annotations

import jax.numpy as jnp


def quat_mul(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product in xyzw order: rotation(q1 *= apply q2 then q1).

    Matches scipy: R.from_quat(quat_mul(q1, q2)) == R.from_quat(q1) * R.from_quat(q2).
    """
    x1, y1, z1, w1 = jnp.moveaxis(q1, -1, 0)
    x2, y2, z2, w2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=-1,
    )


def quat_rot_z(angle_rad: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (xyzw) for a rotation of ``angle_rad`` about Z."""
    half = angle_rad / 2.0
    zeros = jnp.zeros_like(half)
    return jnp.stack([zeros, zeros, jnp.sin(half), jnp.cos(half)], axis=-1)


def quat_rot_x(angle_rad: jnp.ndarray) -> jnp.ndarray:
    half = angle_rad / 2.0
    zeros = jnp.zeros_like(half)
    return jnp.stack([jnp.sin(half), zeros, zeros, jnp.cos(half)], axis=-1)


def euler_zyx_to_quat(euler_deg: jnp.ndarray) -> jnp.ndarray:
    """Intrinsic 'ZYX' Euler angles (degrees, [..., 3]) -> xyzw quaternion."""
    a, b, c = jnp.moveaxis(jnp.deg2rad(euler_deg), -1, 0)
    qz = quat_rot_z(a)
    qy_half = b / 2.0
    zeros = jnp.zeros_like(qy_half)
    qy = jnp.stack([zeros, jnp.sin(qy_half), zeros, jnp.cos(qy_half)], axis=-1)
    qx = quat_rot_x(c)
    return quat_mul(quat_mul(qz, qy), qx)


def quat_to_euler_zyx(q: jnp.ndarray, degrees: bool = True) -> jnp.ndarray:
    """xyzw quaternion -> intrinsic 'ZYX' Euler angles [..., 3] (a, b, c).

    Uses the rotation-matrix elements of R = Rz(a) Ry(b) Rx(c):
      a = atan2(R10, R00), b = -asin(R20), c = atan2(R21, R22).
    """
    x, y, z, w = jnp.moveaxis(q, -1, 0)
    # matrix entries for a unit quaternion
    r00 = 1 - 2 * (y * y + z * z)
    r10 = 2 * (x * y + w * z)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    a = jnp.arctan2(r10, r00)
    b = -jnp.arcsin(jnp.clip(r20, -1.0, 1.0))
    c = jnp.arctan2(r21, r22)
    e = jnp.stack([a, b, c], axis=-1)
    return jnp.rad2deg(e) if degrees else e


def task_augment_quat(q: jnp.ndarray, noise_ele_deg: jnp.ndarray,
                      noise_azi_deg: jnp.ndarray) -> jnp.ndarray:
    """Apply per-task pose noise to quaternions ``q`` [..., N, 4].

    Equivalent to the reference's Euler round-trip: Z angle += noise_ele,
    X angle -= noise_azi (`/root/reference/utils/utils.py:44-54`); noise args
    broadcast over the instance axis.
    """
    d_z = jnp.deg2rad(jnp.asarray(noise_ele_deg, dtype=q.dtype))
    d_x = jnp.deg2rad(-jnp.asarray(noise_azi_deg, dtype=q.dtype))
    qz = quat_rot_z(d_z)[..., None, :]
    qx = quat_rot_x(d_x)[..., None, :]
    return quat_mul(quat_mul(qz, q), qx)


def quat_canonicalize(q: jnp.ndarray) -> jnp.ndarray:
    """Sign-flip quaternions whose component 1 (y in xyzw) is negative.

    The reference canonicalizes its dataset quats to a semi-sphere by this
    exact (unusual: component 1, not w) rule — /root/reference/dataset/shapenet_3d.py:226-228.
    """
    flip = q[..., 1:2] < 0
    return jnp.where(flip, -q, q)
