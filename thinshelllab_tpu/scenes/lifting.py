"""Lifting task: move the soft box resting on the sheet by (-12mm, -12mm)
using one top pad and two bottom pads.

Reference: task_scene/Scene_lifting.py (k_contact=500, Newton cap 15, box
5^3 density 20000, cloth zero-g, box under gravity).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.builder import SceneBuilder
from . import base, cloth_init


def make(cloth_size=0.06, kb=100.0, mu_cloth_elastic=5.0, solver="dense",
         dtype=jnp.float64, max_newton_iter=15) -> base.TaskScene:
    N = M = 15
    dx = cloth_size / N
    b = SceneBuilder(
        dt=5e-3, k_contact=500.0, eps_contact=4e-4, eps_v=1e-2, damping=1.0,
        max_newton_iter=max_newton_iter, gravity=(0.0, 0.0, -9.8),
        plastic=False, solver=solver, dtype=dtype,
    )
    cloth = b.add_cloth(N, M, cloth_size, rho=40.0,
                        init_pos=cloth_init.grid_flat(N, M, dx, -0.03, -0.03, 0.0),
                        kb=kb, gravity_on=False)
    box = b.add_cube_elastic(5, 5, 5, 0.007, (-0.025, -0.005, 0.0003),
                             density=20000.0, E=5e5, nu=0.0, gravity_on=True)
    pads = [
        b.add_tactile((0.01, 0.0, 0.0079), flip=True, ratio=0.5),
        b.add_tactile((0.0, -0.015, -0.0079), flip=False, ratio=0.5),
        b.add_tactile((0.0, 0.015, -0.0079), flip=False, ratio=0.5),
    ]
    mu = b.new_mu_slot(mu_cloth_elastic)
    for el in [box] + pads:
        b.add_contact_pair(cloth, el, mu)
        b.add_contact_pair(el, cloth, mu)

    def frozen_fn(bb, frozen):
        for p in pads:
            vs, _ = bb.vrange(p)
            frozen[vs + bb.bodies[p].tet_mesh.bound_idx] = True

    b.freeze(frozen_fn)
    b.set_gripper(
        "single", pads, [0, 1, 2], [0, 0, 0],
        np.array([[0.01, 0.0, 0.0079], [0.0, -0.015, -0.0079],
                  [0.0, 0.015, -0.0079]]),
    )
    spec, state0, params = b.build()
    bs, be = spec.body_v_start[1], spec.body_v_end[1]
    pos0_box = jnp.asarray(state0.pos[bs:be])
    target_delta = jnp.array([-0.012, -0.012, 0.0])

    def reward(buffers):
        d = buffers["pos"][-1, bs:be] - pos0_box - target_delta
        return -jnp.sum(d * d)

    def seed_loss(buffers):
        T = buffers["pos"].shape[0]
        NH = spec.cloth.hinge_verts.shape[0]
        pg = jnp.zeros((T, spec.NV, 3), spec.dtype)
        # reference get_loss_lift (analytic_grad_single.py:303-312): seeds
        # (pos - pos0 + 0.012) per axis, without the factor 2
        d = buffers["pos"][T - 1, bs:be] - buffers["pos"][0, bs:be] + jnp.array(
            [0.012, 0.012, 0.0]
        )
        pg = pg.at[T - 1, bs:be].set(d)
        return pg, jnp.zeros((T, NH), spec.dtype)

    return base.TaskScene(
        name="lifting", spec=spec, state0=state0, params=params, n_part=3,
        rewards={"default": reward}, seed_loss=seed_loss, builder=b,
    )
