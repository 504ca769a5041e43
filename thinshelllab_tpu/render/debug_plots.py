"""Diagnostic 3D plots: body scatter, contact-force quiver, surface-normal
quiver (reference BaseScene.debug_plot:1254-1266, plot_contact_force
:1269-1288, model_elastic_tactile.plot_normal:426-437).

The reference's versions pull Taichi fields to torch and quiver them with
matplotlib; here the quantities are computed functionally from (spec,
params, state) -- contact forces as the negated gradient of the masked
contact groups, normals from the face soup -- and plotted headless (Agg).
"""
from __future__ import annotations

import os

import jax.numpy as jnp
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

from ..core.spec import Params, SceneSpec, SimState  # noqa: E402
from ..engine import elements, stepper  # noqa: E402
from ..ops import collision  # noqa: E402


def _body_slice(spec: SceneSpec, body_idx: int):
    return spec.body_v_start[body_idx], spec.body_v_end[body_idx]


def debug_plot(spec: SceneSpec, pos, body_idx: int, path: str,
               normals: bool = False, zlim=(-0.001, 0.01)):
    """Scatter one body's vertices (reference BaseScene.debug_plot:1254:
    per-body slice, fixed z-limits, optional vertex-normal quiver -- the
    reference keeps the quiver commented out; here it's an option)."""
    vs, ve = _body_slice(spec, body_idx)
    x = np.asarray(pos)[vs:ve]
    ax = plt.figure().add_subplot(projection="3d")
    if zlim is not None:
        ax.set_zlim(*zlim)
    ax.scatter(x[:, 0], x[:, 1], x[:, 2])
    if normals:
        vn = np.asarray(
            collision.vertex_normals(jnp.asarray(pos), spec.faces, spec.NV)
        )[vs:ve]
        ax.quiver(x[:, 0], x[:, 1], x[:, 2], vn[:, 0], vn[:, 1], vn[:, 2],
                  normalize=True, length=0.01)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    plt.savefig(path)
    plt.close()
    return path


def contact_forces(spec: SceneSpec, params: Params, state: SimState):
    """Per-vertex contact force (-d(barrier+friction)/dx, masked to the
    active set), the quantity the reference quivers from its tmp_f
    analysis buffer (BaseScene.plot_contact_force:1277)."""
    pos = jnp.asarray(state.pos)
    contact, _, _ = stepper.build_contacts(
        spec, params, pos, pos, state.proj_flag, state.proj_dir)
    force = jnp.zeros_like(pos)
    for ev in (elements.barrier_eval, elements.friction_eval):
        _, grp = ev(spec, contact, pos, False, False)
        force = force.at[grp["idx"]].add(-grp["g"])
    return force


def plot_contact_force(spec: SceneSpec, params: Params, state: SimState,
                       body_idx: int, path: str,
                       lims=((-0.2, 0.2), (-0.2, 0.2), (-0.3, 0.3))):
    """Quiver of contact forces on one body's vertices (reference
    plot_contact_force:1269-1288: fixed axis box, red arrows, length 1)."""
    vs, ve = _body_slice(spec, body_idx)
    x = np.asarray(state.pos)[vs:ve]
    f = np.asarray(contact_forces(spec, params, state))[vs:ve]
    ax = plt.figure().add_subplot(projection="3d")
    if lims is not None:
        ax.set_xlim(*lims[0])
        ax.set_ylim(*lims[1])
        ax.set_zlim(*lims[2])
    ax.quiver(x[:, 0], x[:, 1], x[:, 2], f[:, 0], f[:, 1], f[:, 2],
              length=1, color="red")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    plt.savefig(path)
    plt.close()
    return path


def plot_normal(spec: SceneSpec, pos, body_idx: int, path: str,
                scale: float = 0.001):
    """Face-centroid scatter + outward face-normal quiver for one body's
    surface triangles (reference model_elastic_tactile.get_surf_normal
    :415-423 + plot_normal:426-437: normals scaled to 1 mm, red)."""
    fs, fe = spec.body_f_start[body_idx], spec.body_f_end[body_idx]
    tri = np.asarray(spec.faces)[fs:fe]
    p = np.asarray(pos)
    p1, p2, p3 = p[tri[:, 0]], p[tri[:, 1]], p[tri[:, 2]]
    n = np.cross(p2 - p1, p3 - p1)
    norm = np.linalg.norm(n, axis=1, keepdims=True)
    n = n / np.maximum(norm, 1e-30) * scale
    c = (p1 + p2 + p3) / 3.0
    ax = plt.figure().add_subplot(projection="3d")
    ax.scatter(c[:, 0], c[:, 1], c[:, 2])
    ax.quiver(c[:, 0], c[:, 1], c[:, 2], n[:, 0], n[:, 1], n[:, 2],
              length=1, color="red")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    plt.savefig(path)
    plt.close()
    return path
