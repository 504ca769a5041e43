"""Quaternion utilities (scalar-first convention, matching the reference
effector kinematics at gripper_tactile.py:150-218)."""
from __future__ import annotations

import jax.numpy as jnp


def quat_to_rotmat(q):
    """(..., 4) scalar-first quaternion -> (..., 3, 3) rotation matrix.

    Mirrors reference gripper_tactile.quat_to_rotmat (un-normalized form:
    valid for unit quaternions)."""
    s, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r = jnp.stack(
        [
            s * s + x * x - y * y - z * z,
            2 * (x * y - s * z),
            2 * (x * z + s * y),
            2 * (x * y + s * z),
            s * s - x * x + y * y - z * z,
            2 * (y * z - s * x),
            2 * (x * z - s * y),
            2 * (y * z + s * x),
            s * s - x * x - y * y + z * z,
        ],
        axis=-1,
    )
    return r.reshape(q.shape[:-1] + (3, 3))


def rotmat_to_quat(m):
    """(..., 3, 3) -> (..., 4); assumes trace > -1 (as the reference does)."""
    s = jnp.sqrt(1.0 + m[..., 0, 0] + m[..., 1, 1] + m[..., 2, 2]) / 2.0
    x = (m[..., 2, 1] - m[..., 1, 2]) / (4 * s)
    y = (m[..., 0, 2] - m[..., 2, 0]) / (4 * s)
    z = (m[..., 1, 0] - m[..., 0, 1]) / (4 * s)
    return jnp.stack([s, x, y, z], axis=-1)


def quat_apply_delta_rot(q, delta_rot):
    """Reference rotation update (gripper_tactile.step_simple:178-190):

      real = -delta_rot . v,  res = q_s * delta_rot + delta_rot x v
      q <- normalize(q + (real, res))

    where v is the vector part of q. `delta_rot` is a small rotation vector
    (this is q <- normalize(q + dq*q_like) -- replicate exactly)."""
    v = q[..., 1:]
    real = -jnp.sum(delta_rot * v, axis=-1)
    res = q[..., 0:1] * delta_rot + jnp.cross(delta_rot, v)
    q_new = q + jnp.concatenate([real[..., None], res], axis=-1)
    return q_new / jnp.linalg.norm(q_new, axis=-1, keepdims=True)
