"""GelSight tactile-sensor calibration utilities.

Reference engine/blob.py: fisheye projection / inverse-projection of the
tactile sensor's marker dots, used offline to calibrate the simulated pad
against real sensor captures. jnp-vectorized.
"""
from __future__ import annotations

import jax.numpy as jnp


def fisheye_project(points, f=1.0, center=(0.0, 0.0)):
    """Equidistant fisheye projection of 3D points (sensor frame, +z toward
    the camera): r_img = f * theta, theta = angle from the optical axis.
    points: (..., 3) -> (..., 2)."""
    x, y, z = points[..., 0], points[..., 1], points[..., 2]
    r = jnp.sqrt(x * x + y * y)
    theta = jnp.arctan2(r, z)
    scale = jnp.where(r > 1e-12, f * theta / jnp.maximum(r, 1e-12), f / jnp.maximum(z, 1e-12))
    u = x * scale + center[0]
    v = y * scale + center[1]
    return jnp.stack([u, v], axis=-1)


def fisheye_unproject(uv, depth, f=1.0, center=(0.0, 0.0)):
    """Inverse of fisheye_project at a given z-depth. uv: (..., 2)."""
    du = uv[..., 0] - center[0]
    dv = uv[..., 1] - center[1]
    r_img = jnp.sqrt(du * du + dv * dv)
    theta = r_img / f
    r = depth * jnp.tan(theta)
    scale = jnp.where(r_img > 1e-12, r / jnp.maximum(r_img, 1e-12), 0.0)
    return jnp.stack([du * scale, dv * scale,
                      jnp.broadcast_to(depth, du.shape)], axis=-1)


def marker_displacements(surface_idx, pad_local_before, pad_local_after,
                         f=1.0):
    """Projected 2D marker-dot displacements between two pad configurations
    (the quantity the reference plots in gripper plot_tactile)."""
    a = fisheye_project(pad_local_before[surface_idx], f)
    b = fisheye_project(pad_local_after[surface_idx], f)
    return b - a
