"""TaskScene: a built scene plus its task definition (rewards, adjoint loss
seeds, early-stop test, observations).

This formalizes the reference's string-keyed scene/reward registry
(RL_env.py:53,198; run_cmaes_all.py:46) -- see scenes/registry.py.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.spec import Params, SceneSpec, SimState
from ..engine import elements


@dataclasses.dataclass
class TaskScene:
    name: str
    spec: SceneSpec
    state0: SimState
    params: Params
    n_part: int
    # reward(name) -> fn(buffers, params) -> scalar; 'default' is the task reward
    rewards: Dict[str, Callable] = dataclasses.field(default_factory=dict)
    # seed_loss(buffers) -> (pos_grad (T,NV,3), angleref_grad (T,NH))
    seed_loss: Optional[Callable] = None
    # objective variants: reward-name -> matching adjoint seed (reference
    # selects these with per-driver flags, e.g. trajopt_interact.py --sep,
    # trajopt_balancing.py --throwing); missing names fall back to the
    # default seed_loss
    seed_losses: Dict[str, Callable] = dataclasses.field(default_factory=dict)
    # which physical parameter the 'dp' drivers optimize ('kb' | 'mu_pair:<i>')
    sys_param: Optional[str] = None
    # action limiting
    max_moving_dist: float = 0.001
    builder: object = None

    def reward(self, buffers, name: str = "default"):
        return self.rewards[name](buffers)

    def seed_for(self, name: str = "default"):
        """The adjoint seed matching a reward variant (default seed_loss
        when the variant has no dedicated seed)."""
        return self.seed_losses.get(name, self.seed_loss)


def effector_total_forces(spec: SceneSpec, params: Params, state: SimState):
    """Net internal force on each effector part's driven boundary
    (reference BaseScene.gather_force:1541-1549 over elastics' get_force).

    Returns (n_part, 3)."""
    g = spec.gripper
    if g.mode == "none":
        return jnp.zeros((0, 3), state.pos.dtype)
    # tactile internal elastic force = -dE/dx of the tactile soup
    _, grp = elements.tact_eval(spec, params, state.pos, False, False)
    force = jnp.zeros_like(state.pos)
    force = force.at[grp["idx"]].add(-grp["g"])
    force = force + spec.mass[:, None] * spec.gravity + spec.ext_force
    out = jnp.zeros((g.n_part, 3), state.pos.dtype)
    for p in range(g.n_pads):
        gidx = g.pad_offset[p] + g.bound_idx
        out = out.at[g.pad_part[p]].add(jnp.sum(force[gidx], axis=0))
    return out


def check_early_stop(spec, params, state, frame, rl=False):
    """Reference BaseScene.check_early_stop:1559-1584: NaN positions, any
    effector force component > 10 N, or (trajopt mode) contact lost after
    frame 10. Returns a bool scalar."""
    nan = jnp.any(jnp.isnan(state.pos))
    f = effector_total_forces(spec, params, state)
    too_much = jnp.any(jnp.abs(f) > 10.0)
    norm = jnp.linalg.norm(f, axis=1)
    lost = jnp.any(norm < 0.2) & (frame > 10) & (not rl)
    return nan | too_much | lost


def observation(spec: SceneSpec, state: SimState, n_obs_cloth=4, n_obs_elastic=16):
    """Subsampled cloth pos/vel + elastic samples + gripper poses
    (reference BaseScene.get_observation_kernel:1586-1619)."""
    obs = []
    c = spec.cloth
    for ci in range(c.n_cloths):
        N, M = c.N[ci], c.M[ci]
        off = c.offsets[ci]
        n_s = N // 4
        m_s = M // 4
        for j in range(n_obs_cloth):
            for k in range(n_obs_cloth):
                jj = n_s // 2 + j * n_s
                kk = m_s // 2 + k * m_s
                # reference parity: BaseScene:1593 indexes jj*cloth_N + kk
                # with cloth_N = N, NOT the (M+1) row stride its own mesh
                # uses -- a skewed but deterministic sample set that RL
                # policies were trained on; reproduced verbatim (clamped
                # into the cloth for safety; in-range for every shipped
                # scene).
                vid = off + min(jj * N + kk, (N + 1) * (M + 1) - 1)
                obs.append(state.pos[vid])
                obs.append(state.vel[vid])
    for b in range(spec.n_bodies):
        vs, ve = spec.body_v_start[b], spec.body_v_end[b]
        if any(off == vs for off in c.offsets):
            continue  # cloth body
        nv = ve - vs
        for j in range(n_obs_elastic):
            ii = (nv // n_obs_elastic) * j - 1
            obs.append(state.pos[vs + ii])
            obs.append(state.vel[vs + ii])
    flat = jnp.concatenate([jnp.ravel(o) for o in obs]) if obs else jnp.zeros((0,))
    g = spec.gripper
    if g.mode != "none":
        gp = jnp.concatenate([state.gripper.pos, state.gripper.rot], axis=1)
        flat = jnp.concatenate([flat, gp.ravel()])
    return flat


def hinge_row_mask(builder, cloth_body, row_v0, row_v3):
    """Mask over the hinge soup selecting hinges whose v0 lies in grid row
    `row_v0` and whose v3 lies in row `row_v3` of the given cloth (used by
    folding/pick rewards; reference Scene_folding.compute_reward:130-147)."""
    b = builder.bodies[cloth_body]
    m = b.cloth_mesh
    Mp1 = m.M + 1
    NH = m.NF * 3
    mask = np.zeros(NH, bool)
    for i in range(m.NF):
        for l in range(3):
            if m.counter_face[i, l] > i:
                v0 = m.f2v[i, l]
                v3 = m.f2v[m.counter_face[i, l], m.counter_point[i, l]]
                if v0 // Mp1 == row_v0 and v3 // Mp1 == row_v3:
                    mask[i * 3 + l] = True
    return mask


def force_loss_pos_grad(spec: SceneSpec, params: Params, pos, grad_force):
    """dL/dpos for a loss seeded on the effector boundary force
    (generalizes the reference's tactile compute_force_deri,
    model_elastic_tactile.py:373-414, via one AD vjp): grad_force is
    (n_part, 3) = dL/d(total bound force per part)."""
    g = spec.gripper

    def bound_forces(p):
        _, grp = elements.tact_eval(spec, params, p, False, False)
        force = jnp.zeros_like(p)
        force = force.at[grp["idx"]].add(-grp["g"])
        out = jnp.zeros((g.n_part, 3), p.dtype)
        for pad in range(g.n_pads):
            gidx = g.pad_offset[pad] + g.bound_idx
            out = out.at[g.pad_part[pad]].add(jnp.sum(force[gidx], axis=0))
        return out

    _, vjp = jax.vjp(bound_forces, pos)
    (pg,) = vjp(jnp.asarray(grad_force, pos.dtype))
    return pg
