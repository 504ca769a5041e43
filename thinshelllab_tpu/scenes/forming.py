"""Forming task: press a pre-curled strip into a target shape.

Reference: task_scene/Scene_forming.py (15x7 strip, half_curve_num=3,
k_contact=2e4, target positions loaded from npy).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.builder import SceneBuilder
from ..engine.stepper import update_ref_angle
from . import base, cloth_init


def make(cloth_size=0.06, kb=200.0, mu_cloth_elastic=5.0, target_pos=None,
         solver="dense", dtype=jnp.float64, max_newton_iter=50) -> base.TaskScene:
    N, M = 15, 7
    dx = cloth_size / N
    b = SceneBuilder(
        dt=5e-3, k_contact=20000.0, eps_contact=4e-4, eps_v=1e-2, damping=1.0,
        max_newton_iter=max_newton_iter, gravity=(0.0, 0.0, 0.0),
        plastic=True, solver=solver, dtype=dtype,
    )
    cloth_pos = cloth_init.grid_fold(N, M, dx, -0.07, -0.02, 0.00035, 3)
    cloth = b.add_cloth(N, M, cloth_size, rho=40.0, kb=kb,
                        init_pos=cloth_pos)
    table = b.add_cube_elastic(9, 9, 2, 0.07, (-0.035, -0.035, -0.00875),
                               E=5e5, nu=0.0)
    r = cloth_init.fold_radius(dx, 3)
    x = -0.07 + (7 + 3) / 16 * 0.1 - r * 0.86 + 0.01
    pad = b.add_tactile((x, 0.0, 2 * r + 0.00785), flip=True, ratio=0.5)

    mu = b.new_mu_slot(mu_cloth_elastic)
    for el in (table, pad):
        b.add_contact_pair(cloth, el, mu)
        b.add_contact_pair(el, cloth, mu)

    def frozen_fn(bb, frozen):
        vs, ve = bb.vrange(table)
        frozen[vs:ve] = True
        pvs, _ = bb.vrange(pad)
        frozen[pvs + bb.bodies[pad].tet_mesh.bound_idx] = True
        cvs, _ = bb.vrange(cloth)
        frozen[cvs + N * (M + 1) + np.arange(M + 1)] = True

    b.freeze(frozen_fn)
    b.set_gripper("single", [pad], [0], [0],
                  np.array([[x, 0.0, 2 * r + 0.00785]]))
    spec, state0, params = b.build()
    ref0 = update_ref_angle(spec, jnp.asarray(state0.pos),
                            jnp.asarray(state0.ref_angle))
    state0 = state0.replace(ref_angle=np.asarray(ref0))

    cloth_nv = (N + 1) * (M + 1)
    if target_pos is None:
        target_pos = cloth_init.grid_flat(N, M, dx, -0.07, -0.02, 0.00035)
    target = jnp.asarray(target_pos, spec.dtype)

    def reward(buffers):
        d = buffers["pos"][-1, :cloth_nv] - target
        return -jnp.sum(d * d)

    def seed_loss(buffers):
        # get_loss_push: dL/dx = 2 (x - target) at the final step
        T = buffers["pos"].shape[0]
        NH = spec.cloth.hinge_verts.shape[0]
        pg = jnp.zeros((T, spec.NV, 3), spec.dtype)
        pg = pg.at[T - 1, :cloth_nv].set(
            2.0 * (buffers["pos"][T - 1, :cloth_nv] - target)
        )
        return pg, jnp.zeros((T, NH), spec.dtype)

    return base.TaskScene(
        name="forming", spec=spec, state0=state0, params=params, n_part=1,
        rewards={"default": reward}, seed_loss=seed_loss, builder=b,
    )
