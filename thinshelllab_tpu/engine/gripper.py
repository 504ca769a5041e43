"""Rigid effector kinematics (reference engine/gripper_tactile.py and
engine/gripper_single.py) as pure functions of GripperState.

Each "part" is a 6-DoF rigid frame (position + quaternion) owning one pad
('single' mode) or an upper/lower pad pair with an opening DOF ('paired').
Driving writes the pads' frozen boundary vertices; the rest of each pad
deforms elastically in the solver.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.spec import GripperState, SceneSpec
from ..utils.quaternion import quat_apply_delta_rot, quat_to_rotmat


def gripper_step(spec: SceneSpec, gs: GripperState, delta_pos, delta_rot, delta_dis):
    """Apply a per-part action (reference step/step_simple:178-218)."""
    g = spec.gripper
    if g.mode == "none":
        return gs
    pos = gs.pos + delta_pos
    rot = quat_apply_delta_rot(gs.rot, delta_rot)
    dist = gs.dist
    pad_local = gs.pad_local
    if g.mode == "paired":
        dist = dist + delta_dis
        # open_gripper: upper pads +dz, lower pads -dz (reference :214-218)
        signs = jnp.asarray(g.pad_sign, pos.dtype)  # (n_pads,)
        parts = jnp.asarray(g.pad_part, jnp.int32)
        dz = signs * delta_dis[parts]
        pad_local = pad_local.at[:, :, 2].add(dz[:, None])
    return GripperState(pos=pos, rot=rot, dist=dist, pad_local=pad_local)


def pad_world_positions(spec: SceneSpec, gs: GripperState):
    """(n_pads, n_pad_verts, 3) world coordinates of every pad vertex."""
    g = spec.gripper
    parts = jnp.asarray(g.pad_part, jnp.int32)
    R = quat_to_rotmat(gs.rot)[parts]  # (n_pads, 3, 3)
    t = gs.pos[parts]  # (n_pads, 3)
    return jnp.einsum("pij,pvj->pvi", R, gs.pad_local) + t[:, None, :]


def write_bound_vertices(spec: SceneSpec, pos, gs: GripperState):
    """Write the rigid pose into the pads' frozen boundary vertices
    (reference update_bound:245-249)."""
    g = spec.gripper
    if g.mode == "none":
        return pos
    world = pad_world_positions(spec, gs)  # (n_pads, n_pad_verts, 3)
    for p in range(g.n_pads):
        gidx = g.pad_offset[p] + g.bound_idx
        pos = pos.at[gidx].set(world[p, g.bound_idx])
    return pos


def gather_gripper_grad(spec: SceneSpec, gs: GripperState, tmp_z_frozen):
    """Pull the adjoint frozen-column vector back to 6-DoF per-part gradients
    (reference gather_grad: gripper_tactile.py:221-242 / gripper_single.py
    :134-150). tmp_z_frozen: (NV, 3). Returns (n_part, 6)."""
    g = spec.gripper
    d_pos = jnp.zeros((g.n_part, 3), tmp_z_frozen.dtype)
    d_angle = jnp.zeros((g.n_part, 3), tmp_z_frozen.dtype)
    parts = jnp.asarray(g.pad_part, jnp.int32)
    R = quat_to_rotmat(gs.rot)
    for p in range(g.n_pads):
        part = g.pad_part[p]
        gidx = g.pad_offset[p] + g.bound_idx
        grad = tmp_z_frozen[gidx]  # (nb, 3)
        arm = jnp.einsum("ij,vj->vi", R[part], gs.pad_local[p, g.bound_idx])
        d_pos = d_pos.at[part].add(jnp.sum(grad, axis=0))
        d_angle = d_angle.at[part].add(jnp.sum(jnp.cross(arm, grad), axis=0))
    pads_per_part = 2 if g.mode == "paired" else 1
    denom = float(pads_per_part * g.n_bound)
    d_pos = jnp.clip(d_pos / denom, -10.0, 10.0)
    angle_clip = 10.0 if g.mode == "paired" else 100.0
    d_angle = jnp.clip(d_angle / denom, -angle_clip, angle_clip)
    return jnp.concatenate([d_pos, d_angle], axis=1)
