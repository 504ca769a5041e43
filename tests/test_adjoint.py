"""Trajectory-gradient validation: adjoint vs finite differences.

The adjoint inherits the reference's deliberate approximations (contact set
rebuilt at the pre-action state, contact frame/normal held constant, plastic
0.1 leak), so end-to-end FD agreement is checked directionally with a
moderate tolerance, while the core IFT solve is checked tightly on a
single-step problem.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from thinshelllab_tpu.engine import adjoint, stepper
from thinshelllab_tpu.scenes import folding


@pytest.fixture(scope="module")
def scene():
    return folding.make(table_n=5, max_newton_iter=30)


def make_actions(T, n_part, dz=-0.0004):
    dpos = np.zeros((T, n_part, 3))
    dpos[:, :, 2] = dz
    return (
        jnp.asarray(dpos),
        jnp.zeros((T, n_part, 3)),
        jnp.zeros((T, n_part)),
    )


def run_loss(scene, actions):
    """L = sum_z of cloth vertices at final step (position-seeded loss)."""
    _, buffers = stepper.simulate(scene.spec, scene.params, scene.state0, actions)
    cloth_nv = scene.spec.cloth.NV_per[0]
    return float(jnp.sum(buffers["pos"][-1, :cloth_nv, 2])), buffers


def test_trajectory_gradient_directional(scene):
    # established-contact regime: across a contact-set activation the true
    # derivative is discontinuous and FD is meaningless, so probe a step
    # where the pad has been pressing for several frames
    T_steps = 5
    actions = make_actions(T_steps, scene.n_part, dz=-0.0006)
    loss0, buffers = run_loss(scene, actions)

    T = T_steps + 1
    NV = scene.spec.NV
    NH = scene.spec.cloth.hinge_verts.shape[0]
    cloth_nv = scene.spec.cloth.NV_per[0]
    seed_pos = jnp.zeros((T, NV, 3))
    seed_pos = seed_pos.at[T - 1, :cloth_nv, 2].set(1.0)
    seed_ar = jnp.zeros((T, NH))

    res = adjoint.backward(scene.spec, scene.params, buffers, seed_pos, seed_ar)
    gg = np.asarray(res.gripper_grad)  # (T, n_part, 6)
    assert np.all(np.isfinite(gg))
    assert np.abs(gg).max() > 0, "gripper grad must be nonzero (pad touches cloth)"

    # directional FD in trajectory space: perturb the step-t z-action of the
    # gripper. Trajectory waypoint t affects actions t and t+1 (deltas).
    rng = np.random.default_rng(0)
    # gradient w.r.t. waypoint traj[t] equals gripper_grad[t] in the
    # reference convention; actions are waypoint differences. Perturbing
    # waypoint t by e_z changes action_t by +e and action_{t+1} by -e.
    t_probe = 3
    h = 2e-6
    for sign_dim in [2, 0]:
        d = np.zeros(3)
        d[sign_dim] = 1.0
        dpos = np.asarray(actions[0]).copy()
        dpos[t_probe - 1, 0] += h * d   # action index t-1 = step t
        if t_probe < T_steps:
            dpos[t_probe, 0] -= h * d
        acts_p = (jnp.asarray(dpos), actions[1], actions[2])
        loss_p, _ = run_loss(scene, acts_p)
        dpos_m = np.asarray(actions[0]).copy()
        dpos_m[t_probe - 1, 0] -= h * d
        if t_probe < T_steps:
            dpos_m[t_probe, 0] += h * d
        acts_m = (jnp.asarray(dpos_m), actions[1], actions[2])
        loss_m, _ = run_loss(scene, acts_m)
        fd = (loss_p - loss_m) / (2 * h)
        # the reference's gather_grad AVERAGES over bound vertices
        # (gripper_single.py:146); the true rigid-translation derivative is
        # the sum, so scale by n_bound for comparison
        scale = scene.spec.gripper.n_bound * (
            2 if scene.spec.gripper.mode == "paired" else 1
        )
        an = float(gg[t_probe, 0, sign_dim]) * scale
        assert np.isfinite(fd)
        if abs(fd) > 1e-3 or abs(an) > 1e-3:
            rel = abs(fd - an) / max(abs(fd), abs(an))
            if sign_dim == 2:
                # normal direction: contact frames held fixed -> moderate tol
                assert rel < 0.25, (sign_dim, fd, an, rel)
            else:
                # tangential direction flows through the semi-implicit
                # friction (per-step dx0 anchors, lagged pressure) -- the
                # reference's adjoint makes the same approximations; require
                # the descent DIRECTION to agree
                assert np.sign(fd) == np.sign(an), (sign_dim, fd, an)


def test_single_step_ift_exact(scene):
    """Tight check of the IFT core: dL/d(frozen pad DOFs) for one step with
    the contact set held fixed must match FD through the Newton solve."""
    from thinshelllab_tpu.engine import elements, solver
    from thinshelllab_tpu.engine.stepper import build_contacts

    spec, params, st = scene.spec, scene.params, scene.state0
    # take two pre-steps so the pad is in contact
    act = make_actions(2, scene.n_part, dz=-0.0006)
    st2, _ = stepper.rollout(spec, params, st, act)
    pos0 = st2.pos
    vel = st2.vel
    ref = st2.ref_angle
    contact, _, _ = build_contacts(spec, params, pos0, pos0, st2.proj_flag,
                                   st2.proj_dir)
    assert int(contact.active.sum()) > 0

    def solve_from(pos_start):
        return solver.newton_solve(spec, params, pos_start, pos_start, vel,
                                   ref, contact)

    x_star = solve_from(pos0)
    cloth_nv = spec.cloth.NV_per[0]
    L = jnp.zeros_like(x_star).at[:cloth_nv, 2].set(1.0)  # dL/dx

    groups = elements.all_groups(spec, params, x_star, ref, contact,
                                 with_hess=True, spd=False)
    z = solver.solve_linear(spec, groups, L)
    tmp = elements.frozen_column_product(spec, groups, z)

    # FD: move one frozen pad boundary vertex in z, re-solve
    g = spec.gripper
    vid = g.pad_offset[0] + int(np.asarray(g.bound_idx)[0])
    assert bool(spec.frozen[vid, 2])
    h = 1e-7
    for dim in (2, 0):
        e = jnp.zeros_like(pos0).at[vid, dim].set(h)
        Lp = float(jnp.sum(solve_from(pos0 + e)[:cloth_nv, 2]))
        Lm = float(jnp.sum(solve_from(pos0 - e)[:cloth_nv, 2]))
        fd = (Lp - Lm) / (2 * h)
        an = float(tmp[vid, dim])
        if abs(fd) > 1e-6 or abs(an) > 1e-6:
            rel = abs(fd - an) / max(abs(fd), abs(an))
            assert rel < 5e-2, (dim, fd, an, rel)


def test_static_friction_loss_seed(scene):
    """static_friction_loss_pos_grad equals jax.grad of the implied scalar
    loss 0.5*f_ratio*sum_c k_c |u_c(pos)|^2 with the contact frame (T, dx0,
    k, gate) held fixed — the reference's semantics (BaseScene.py:733-776
    evaluates u from live pos but treats const_T/const_dx0/const_k as
    constants of the step)."""
    from thinshelllab_tpu.engine.stepper import build_contacts

    spec, params = scene.spec, scene.params
    act = make_actions(4, scene.n_part, dz=-0.0006)
    st, _ = stepper.rollout(spec, params, scene.state0, act)
    contact, _, _ = build_contacts(spec, params, st.pos, st.pos,
                                   st.proj_flag, st.proj_dir)
    assert int(contact.active.sum()) > 0

    # nudge pos tangentially so some contacts exceed the slip gate
    pos = st.pos + jnp.asarray(
        np.random.default_rng(1).normal(0, 1e-4, st.pos.shape))
    f_ratio = 0.001
    pg = adjoint.static_friction_loss_pos_grad(spec, contact, pos, f_ratio)
    assert np.all(np.isfinite(np.asarray(pg)))

    idx, w, T = contact.idx, contact.w, contact.T
    x = pos[idx]
    xc = jnp.einsum("ck,cki->ci", w, x[:, :3])
    u0 = jnp.einsum("cti,ci->ct", T, x[:, 3] - xc - contact.dx0)
    r0 = jnp.linalg.norm(u0, axis=1)
    gate = contact.active & (r0 > spec.dt * spec.eps_v * 0.9)
    assert int(gate.sum()) > 0, "need sliding contacts for a nonzero seed"

    def loss(p):
        xx = p[idx]
        xc2 = jnp.einsum("ck,cki->ci", w, xx[:, :3])
        u = jnp.einsum("cti,ci->ct", T, xx[:, 3] - xc2 - contact.dx0)
        return 0.5 * f_ratio * jnp.sum(
            jnp.where(gate, contact.k, 0.0) * jnp.sum(u * u, axis=1))

    g_ref = jax.grad(loss)(pos)
    np.testing.assert_allclose(np.asarray(pg), np.asarray(g_ref),
                               rtol=1e-10, atol=1e-12)


def test_yield_gate_tape_matches_recompute(scene):
    """The tape-recorded forward yield decisions (buffers["yield_gate"])
    are the same predicate the backward would re-derive, so the backward
    must produce identical gradients with and without the tape gate at
    matching precision; the tape gate must also actually fire (folding is
    plastic and the press bends hinges past yield)."""
    actions = make_actions(6, scene.n_part, dz=-0.0006)
    _, buffers = stepper.simulate(
        scene.spec, scene.params, scene.state0, actions)
    assert "yield_gate" in buffers
    assert bool(jnp.any(buffers["yield_gate"])), "no hinge ever yielded"

    T, NV = buffers["pos"].shape[:2]
    NH = scene.spec.cloth.hinge_verts.shape[0]
    cloth_nv = scene.spec.cloth.NV_per[0]
    seed_pos = jnp.zeros((T, NV, 3)).at[T - 1, :cloth_nv, 2].set(1.0)
    seed_ar = jnp.zeros((T, NH))

    res_tape = adjoint.backward(
        scene.spec, scene.params, buffers, seed_pos, seed_ar)
    no_gate = {k: v for k, v in buffers.items() if k != "yield_gate"}
    res_rec = adjoint.backward(
        scene.spec, scene.params, no_gate, seed_pos, seed_ar)
    np.testing.assert_allclose(
        np.asarray(res_tape.gripper_grad), np.asarray(res_rec.gripper_grad),
        rtol=0, atol=0)


def test_f32_backward_chain_finite_per_step():
    """Regression: dtype-aware division guards. Literals like 1e-300 are
    ZERO in f32, so degenerate masked-slot faces produced 0/0 = NaN contact
    normals/frames; the NaN then rode the backward carry (NaN * active-mask
    = NaN) and silently zeroed every backward step but the last (measured:
    folding f32 adjoint rel err 0.98 -> 0.009 after the fix). Runs the
    folding backward entirely in f32 and asserts every step contributed."""
    sc32 = folding.make(dtype=jnp.float32, solver="cg", max_newton_iter=8)
    T_steps = 6
    dpos = np.zeros((T_steps, sc32.n_part, 3), np.float32)
    dpos[:, :, 2] = -0.0006
    acts = (jnp.asarray(dpos), jnp.zeros((T_steps, sc32.n_part, 3), jnp.float32),
            jnp.zeros((T_steps, sc32.n_part), jnp.float32))
    _, buffers = stepper.simulate(sc32.spec, sc32.params, sc32.state0, acts)
    assert bool(jnp.all(jnp.isfinite(buffers["pos"])))
    seed_pos, seed_ar = sc32.seed_loss(buffers)
    res = adjoint.backward(sc32.spec, sc32.params, buffers, seed_pos, seed_ar)
    gg = np.asarray(res.gripper_grad)
    assert np.all(np.isfinite(gg))
    # every backward step (1..T-1) must contribute a nonzero gripper grad:
    # the NaN bug manifested as exactly one nonzero step
    per_step = np.abs(gg).max(axis=(1, 2))
    assert (per_step[1:] > 0).all(), per_step


def test_two_sum_survives_jit():
    """The compensated-carry mode relies on TwoSum's error term NOT being
    optimized away by XLA (a fast-math-style reassociation would fold
    (a - (s - bb)) + (b - bb) to zero). Assert the compensation term is
    exact under jit in f32."""
    a = jnp.float32(1.0)
    b = jnp.float32(1e-9)  # vanishes in f32 addition: 1.0 + 1e-9 == 1.0
    s, e = jax.jit(adjoint._two_sum)(a, b)
    assert float(s) == 1.0
    assert float(e) == float(np.float32(1e-9))  # recovered exactly by the EFT


def test_compensated_backward_matches_plain(scene):
    """compensated=True is the identical algorithm in exact arithmetic; at
    f64 on a short horizon the two paths must agree to tight tolerance
    (and the compensated path must be finite / nonzero everywhere)."""
    actions = make_actions(6, scene.n_part, dz=-0.0006)
    _, buffers = stepper.simulate(
        scene.spec, scene.params, scene.state0, actions)
    seed_pos, seed_ar = scene.seed_loss(buffers)
    res_p = adjoint.backward(
        scene.spec, scene.params, buffers, seed_pos, seed_ar)
    res_c = adjoint.backward(
        scene.spec, scene.params, buffers, seed_pos, seed_ar,
        compensated=True)
    gp = np.asarray(res_p.gripper_grad)
    gc = np.asarray(res_c.gripper_grad)
    assert np.all(np.isfinite(gc))
    np.testing.assert_allclose(gc, gp, rtol=1e-12, atol=1e-14)
