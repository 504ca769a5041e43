"""The implicit time step as a pure function: state x action -> state.

Mirrors the reference step structure (BaseScene.time_step:1327-1374 plus the
per-frame driver calls, e.g. trajopt_folding.py:88-98):

  1. effector action: rigid gripper update writes pad boundary vertices
  2. snapshot prev_pos, compute vertex normals
  3. projection query (latched contact side) + contact analysis
  4. line-searched Newton on the incremental potential
  5. damped velocity update and plastic reference-angle update

Everything is jittable; a full rollout is `lax.scan(time_step, ...)`.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.spec import Params, SceneSpec, SimState
from ..ops import collision, energies
from . import gripper, solver


class StepAux(NamedTuple):
    """Per-step saved quantities for the adjoint / analysis."""

    prev_pos: jnp.ndarray
    contact_active: jnp.ndarray
    newton_pos: jnp.ndarray
    yield_gate: jnp.ndarray
    contact: object = None  # ContactSet of this step (save_contacts path)


def update_ref_angle_gate(spec: SceneSpec, pos, ref_angle):
    """Plastic yield update (reference model_fold_offset.update_ref_angle
    :177-186): when |theta - ref| exceeds k_angle, ref moves to the yield
    surface. Also returns the boolean yield decisions, recorded in the
    trajectory tape so the backward a2ax gate reuses the forward's exact
    decisions (adjoint.backward) instead of re-deriving the threshold
    comparison -- at reduced precision a recomputed predicate can flip on
    hinges near the yield surface, which was the measured source of the
    plastic-scene f32 adjoint error (BASELINE.md round-3 table)."""
    c = spec.cloth
    x = pos[c.hinge_verts]
    sel = jnp.asarray(c.hinge_sel, pos.dtype)
    theta = jax.vmap(energies.hinge_angle)(x, sel)
    k_angle = jnp.asarray(c.k_angle, pos.dtype)[c.hinge_cloth]
    dis = theta - ref_angle
    absd = jnp.abs(dis)
    yielded = (absd > k_angle) & c.hinge_mask
    new_ref = ref_angle + jnp.where(yielded, (absd - k_angle) * jnp.sign(dis), 0.0)
    return new_ref, yielded


def update_ref_angle(spec: SceneSpec, pos, ref_angle):
    return update_ref_angle_gate(spec, pos, ref_angle)[0]


def build_contacts(spec: SceneSpec, params: Params, pos, prev_pos, proj_flag,
                   proj_dir):
    vn = collision.vertex_normals(pos, spec.faces, spec.NV)
    proj_flag, proj_dir, tri, w = collision.projection_query(
        spec, pos, vn, proj_flag, proj_dir
    )
    contact = collision.contact_analysis(
        spec, params.mu_pairs, pos, prev_pos, proj_flag, proj_dir, tri, w
    )
    return contact, proj_flag, proj_dir


def time_step(spec: SceneSpec, params: Params, state: SimState, action):
    """action: (delta_pos (G,3), delta_rot (G,3), delta_dis (G,))."""
    # actions may arrive at a different precision (e.g. f64 trajectory
    # tables driving an f32 scene); cast so the scanned state dtype is stable
    delta_pos, delta_rot, delta_dis = (
        jnp.asarray(a, spec.dtype) for a in action
    )
    gs = gripper.gripper_step(spec, state.gripper, delta_pos, delta_rot, delta_dis)
    pos = gripper.write_bound_vertices(spec, state.pos, gs)

    prev_pos = pos
    contact, proj_flag, proj_dir = build_contacts(
        spec, params, pos, prev_pos, state.proj_flag, state.proj_dir
    )

    new_pos = solver.newton_solve(
        spec, params, pos, prev_pos, state.vel, state.ref_angle, contact
    )

    new_vel = (new_pos - prev_pos) * (spec.damping / spec.dt)
    # the yield predicate is evaluated for EVERY scene -- the reference's
    # backward a2ax gate recomputes it unconditionally, plastic or not
    # (model_fold_offset.ref_angle_backprop_a2ax:1191-1193) -- but the ref
    # angle only moves on plastic scenes (BaseScene.time_step:1369)
    new_ref, yield_gate = update_ref_angle_gate(spec, new_pos, state.ref_angle)
    ref_angle = new_ref if spec.plastic else state.ref_angle

    new_state = SimState(
        pos=new_pos,
        vel=new_vel,
        ref_angle=ref_angle,
        proj_flag=proj_flag,
        proj_dir=proj_dir,
        gripper=gs,
    )
    aux = StepAux(prev_pos=prev_pos, contact_active=contact.active,
                  newton_pos=new_pos, yield_gate=yield_gate, contact=contact)
    return new_state, aux


def rollout(spec: SceneSpec, params: Params, state: SimState, actions,
            save_contacts: bool = False):
    """Scan a full trajectory. actions: tuple of (T, G, 3)/(T, G, 3)/(T, G).

    Returns (final_state, buffers) where buffers stack per-step pos,
    ref_angle and gripper pose -- the adjoint's trajectory tape (reference
    analytic_grad_single.copy_pos:38-52).

    save_contacts: additionally stack each step's ContactSet into the tape
    so adjoint.backward can skip the per-backward-step broadphase +
    contact-analysis replay entirely (reference transfer_grad re-runs
    f_contact each step, analytic_grad_single.py:225 -- a Taichi memory
    constraint, not a semantic requirement; ~1 MB/step at bench size is
    trivial HBM). The taped set is the contact set the forward ACTUALLY
    minimized with (post-action positions, forward-latched sides), i.e.
    the backward then differentiates exactly the forward that ran."""

    def f(st, act):
        st2, aux = time_step(spec, params, st, act)
        saved = (st2.pos, st2.ref_angle, st2.gripper.pos, st2.gripper.rot,
                 st2.gripper.dist, st2.gripper.pad_local, aux.yield_gate)
        if save_contacts:
            saved = saved + (aux.contact,)
        return st2, saved

    final, saved = jax.lax.scan(f, state, actions)
    return final, saved


def simulate(spec: SceneSpec, params: Params, state0: SimState, actions,
             save_contacts: bool = False):
    """Run a rollout and return (final_state, buffers) with buffers[t] the
    state after step t (buffers[0] = initial), matching the reference's
    trajectory tape layout (analytic_grad pos_buffer)."""
    final, saved = rollout(spec, params, state0, actions,
                           save_contacts=save_contacts)
    return final, _assemble_buffers(state0, final, saved, save_contacts)


def simulate_chunked(spec: SceneSpec, params: Params, state0: SimState,
                     actions, chunk: int, save_contacts: bool = False):
    """simulate() in host-stitched chunks of `chunk` steps: each chunk is
    one jitted rollout call and the tape segments are concatenated on the
    accelerator between calls. Bit-identical to simulate() (the scan carry
    crosses chunk boundaries unchanged; tests/test_stepper_chunked.py).

    Exists as a crash workaround: this image's TPU worker reproducibly
    dies ("kernel fault") on certain LONG single-program scans (the
    folding forward at T=50, the 40k-tri backward -- PARITY.md known
    gaps), while the same math in shorter programs runs fine."""
    T = actions[0].shape[0]
    if chunk < 1:
        raise ValueError(f"chunk={chunk} must be >= 1")
    # a ragged tail chunk costs one extra compile (different scan length)
    roll_c = jax.jit(
        lambda st, a: rollout(spec, params, st, a,
                              save_contacts=save_contacts))
    st = state0
    outs = []
    for i in range(0, T, chunk):
        st, saved = roll_c(st, tuple(a[i : i + chunk] for a in actions))
        outs.append(saved)
    saved = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *outs)
    return st, _assemble_buffers(state0, st, saved, save_contacts)


def _assemble_buffers(state0: SimState, final: SimState, saved,
                      save_contacts: bool):
    pos, ref, gpos, grot, gdist, glocal, ygate = saved[:7]

    def prepend(x0, xs):
        return jnp.concatenate([x0[None], xs], axis=0)

    buffers = {
        "pos": prepend(state0.pos, pos),
        "ref_angle": prepend(state0.ref_angle, ref),
        "gripper_pos": prepend(state0.gripper.pos, gpos),
        "gripper_rot": prepend(state0.gripper.rot, grot),
        "gripper_dist": prepend(state0.gripper.dist, gdist),
        "pad_local": prepend(state0.gripper.pad_local, glocal),
        # forward yield decisions at step t (gate of update_ref_angle on
        # pos_t vs ref_{t-1}); index [t] aligns with the backward's step t
        "yield_gate": prepend(jnp.zeros_like(ygate[0]), ygate),
        "final_proj_flag": final.proj_flag,
        "final_proj_dir": final.proj_dir,
    }
    if save_contacts:
        # contact[t] is the set step t+1's solve used (no step-0 slot);
        # the backward at step t reads index t-1
        buffers["contact"] = saved[7]
    return buffers
