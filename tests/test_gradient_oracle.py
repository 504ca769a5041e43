"""Reference-chain gradient oracle.

BASELINE.json's gradient criterion is agreement with the reference's
hand-written backward (analytic_grad_single.transfer_grad:217-257). Taichi
cannot be installed in this image, so the reference cannot be executed;
instead this file re-implements that backward chain a SECOND time — eagerly,
in explicit per-element numpy loops transcribed from the reference kernels —
and requires engine/adjoint.backward (one vectorized lax.scan) to match it to
near machine precision (1e-9 relative, f64).

Oracle provenance (what is re-derived vs reused):
  re-derived here in numpy, straight from the reference kernels:
    - clamp ordering (Grad.clamp_grad:178)
    - plastic a2ax chain with the 0.1 leak, yield gate at the step's own
      (pre-update) ref angle, ref_angle_buffer[step-1]
      (model_fold_offset.ref_angle_backprop_a2ax:1180-1209; BaseScene.py:290)
    - bending ref chain x2a (model_fold_offset.ref_angle_backprop_x2a:1155)
    - friction pressure + rest-offset chains
      (BaseScene.contact_energy_backprop:682-730, f1/f2 from :463-478)
    - frozen-column counting product (BaseScene add_H counting path)
    - inertia/damping chains (Grad.get_prev_grad/get_prev_prev_grad:98-110)
    - gripper gather with 1/(2 n_bound) and +-10 clamps
      (gripper_tactile.gather_grad:221-242)
  reused from the repo (each independently FD/unit-validated elsewhere):
    - element Hessian blocks (tests/test_energies FD checks)
    - contact-set reconstruction (tests/test_collision)
    - hinge angle/gradient (tests/test_energies), quaternion rotmat
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from thinshelllab_tpu.engine import adjoint, elements, stepper
from thinshelllab_tpu.ops import energies
from thinshelllab_tpu.scenes import folding
from thinshelllab_tpu.utils.quaternion import quat_to_rotmat


@pytest.fixture(scope="module")
def scene():
    return folding.make(table_n=5, max_newton_iter=30)


def _f1(r, eh):
    return 1.0 / r if r > eh else -r / eh**2 + 2.0 / eh


def _f2(r, eh):
    return -1.0 / r**2 if r > eh else -1.0 / eh**2


def _hinge_theta_grad(spec, pos):
    """Per-hinge (theta, dtheta/dx) via AD on the scalar angle (the repo's
    FD-validated hinge_angle); the CHAIN through these is numpy below."""
    c = spec.cloth
    x = jnp.where(c.hinge_mask[:, None, None], pos[c.hinge_verts],
                  elements._CANON_STENCIL.astype(pos.dtype)[None])
    sel = jnp.asarray(c.hinge_sel, pos.dtype)
    th = jax.vmap(energies.hinge_angle)(x, sel)
    dth = jax.vmap(jax.grad(energies.hinge_angle))(x, sel)
    return np.asarray(th), np.asarray(dth)


def oracle_backward(scene, buffers, seed_pos, seed_ar, damping=1.0):
    spec, params = scene.spec, scene.params
    NV, dt = spec.NV, spec.dt
    mass = np.asarray(spec.mass)
    frozen = np.asarray(spec.frozen)          # (NV, 3) bool
    hmask = np.asarray(spec.cloth.hinge_mask)
    hverts = np.asarray(spec.cloth.hinge_verts)  # (NH, 4)
    kb = np.asarray(params.kb)[np.asarray(spec.cloth.hinge_cloth)]
    k_angle = np.asarray(spec.cloth.k_angle)[np.asarray(spec.cloth.hinge_cloth)]
    d_ref = -2.0 * kb * np.asarray(spec.cloth.hinge_coef)  # dtheta_ref()
    g = spec.gripper
    eh = spec.eps_v * dt

    T = seed_pos.shape[0]
    pg = np.array(seed_pos, np.float64)  # (T, NV, 3) pos_grad buffer
    ar = np.array(seed_ar, np.float64)   # (T, NH)
    gg = np.zeros((T, max(g.n_part, 1), 6))
    proj_flag = jnp.asarray(buffers["final_proj_flag"])
    proj_dir = jnp.asarray(buffers["final_proj_dir"])

    for t in range(T - 1, 0, -1):
        pos_t = np.asarray(buffers["pos"][t])
        # copy_pos_and_refangle loads ref_angle_buffer[step - 1]
        # (BaseScene.py:290): the ref angle step t's energy actually used.
        ref_t = np.asarray(buffers["ref_angle"][t - 1])
        # clamp_grad(step)
        pg[t] = np.clip(pg[t], -1000, 1000)
        ar[t] = np.clip(ar[t], -1000, 1000)

        contact, proj_flag, proj_dir = adjoint._rebuild_contact(
            spec, params, jnp.asarray(buffers["pos"][t - 1]),
            proj_flag, proj_dir)
        cidx = np.asarray(contact.idx)
        cw = np.asarray(contact.w)
        cn = np.asarray(contact.n)
        ck = np.asarray(contact.k)
        cmu = np.asarray(contact.mu)
        cdx0 = np.asarray(contact.dx0)
        cT = np.asarray(contact.T)
        cact = np.asarray(contact.active)

        # --- a2ax (ref_angle_backprop_a2ax) ---
        theta, dth = _hinge_theta_grad(spec, jnp.asarray(pos_t))
        for h in range(hverts.shape[0]):
            if not hmask[h]:
                continue
            ar[t - 1, h] += ar[t, h]
            s = ar[t, h] if abs(theta[h] - ref_t[h]) > k_angle[h] \
                else ar[t, h] * 0.1
            for a in range(4):
                pg[t, hverts[h, a]] += s * dth[h, a]

        # --- H(pos_t, ref_t) z = pos_grad[t] ---
        groups = elements.all_groups(spec, params, jnp.asarray(pos_t),
                                     jnp.asarray(ref_t), contact,
                                     with_hess=True, spd=False)
        Hd = np.asarray(elements.dense_hessian(spec, groups))
        z = np.linalg.solve(Hd, pg[t].reshape(-1)).reshape(NV, 3)

        # --- frozen-column counting: tmp[j] = -sum_{i unfrozen} H_ij z_i ---
        eidx = np.asarray(groups["idx"])      # (E, 4) (ghost = NV)
        eH = np.asarray(groups["H"])          # (E, 4, 4, 3, 3)
        tmp = np.zeros((NV + 1, 3))
        zg = np.concatenate([np.where(frozen, 0.0, z), np.zeros((1, 3))])
        fro = np.concatenate([frozen, np.zeros((1, 3), bool)])
        for e in range(eidx.shape[0]):
            for b in range(4):
                jv = eidx[e, b]
                acc = np.zeros(3)
                for a in range(4):
                    acc += zg[eidx[e, a]] @ eH[e, a, b]
                tmp[jv] -= np.where(fro[jv], acc, 0.0)
        tmp = tmp[:NV]

        x_hat_grad = z * (mass / dt**2)[:, None]

        # --- contact_energy_backprop(diff=True, step-1, z) ---
        for c in range(cidx.shape[0]):
            if not cact[c]:
                continue
            w4a = np.array([cw[c, 0], cw[c, 1], cw[c, 2], -1.0])
            w4b = -w4a
            x4 = pos_t[cidx[c]]
            dx = x4[3] - (cw[c, 0] * x4[0] + cw[c, 1] * x4[1]
                          + cw[c, 2] * x4[2]) - cdx0[c]
            u = cT[c] @ dx
            r = np.linalg.norm(u)
            f1 = _f1(r, eh)
            gvec = (u * ck[c] * f1) @ cT[c]
            pressure = ck[c] / cmu[c]
            s1 = 0.0  # sum over (i1, j1) of z * dfdp
            for i1 in range(4):
                s1 += w4a[i1] * (gvec @ z[cidx[c, i1]])
            s1 /= pressure
            for i2 in range(4):
                pg[t - 1, cidx[c, i2]] += s1 * w4a[i2] * cn[c] * spec.k_contact
            h2 = f1 * np.eye(2)
            if r > 1e-9:
                h2 = h2 + _f2(r, eh) * np.outer(u / r, u)
            h1 = ck[c] * cT[c].T @ h2 @ cT[c]
            zv = sum(w4b[i1] * z[cidx[c, i1]] for i1 in range(4))
            for i2 in range(4):
                pg[t - 1, cidx[c, i2]] += w4b[i2] * (zv @ h1)

        # --- x2a (ref_angle_backprop_x2a) ---
        for h in range(hverts.shape[0]):
            if not hmask[h]:
                continue
            acc = sum(z[hverts[h, a]] @ dth[h, a] for a in range(4))
            ar[t - 1, h] += -d_ref[h] * acc

        # --- inertia/damping chains (unfrozen only) ---
        pg[t - 1] += np.where(frozen, 0.0, (1 + damping) * x_hat_grad)
        if t > 1:
            pg[t - 2] -= np.where(frozen, 0.0, damping * x_hat_grad)

        # --- gripper gather ---
        if g.n_part:
            rot_t = np.asarray(buffers["gripper_rot"][t])
            pad_local = np.asarray(buffers["pad_local"][t])
            R = np.asarray(quat_to_rotmat(jnp.asarray(rot_t)))
            d_pos = np.zeros((g.n_part, 3))
            d_ang = np.zeros((g.n_part, 3))
            for p in range(g.n_pads):
                part = g.pad_part[p]
                for bi in np.asarray(g.bound_idx):
                    grad = tmp[g.pad_offset[p] + bi]
                    d_pos[part] += grad
                    d_ang[part] += np.cross(R[part] @ pad_local[p, bi], grad)
            denom = (2 if g.mode == "paired" else 1) * g.n_bound
            d_pos = np.clip(d_pos / denom, -10, 10)
            clip_a = 10.0 if g.mode == "paired" else 100.0
            d_ang = np.clip(d_ang / denom, -clip_a, clip_a)
            gg[t] = np.concatenate([d_pos, d_ang], axis=1)

    return gg, pg[0] - np.asarray(seed_pos[0]), ar


def test_backward_matches_reference_chain_oracle(scene):
    spec = scene.spec
    T_steps = 4
    n = scene.n_part
    dpos = np.zeros((T_steps, n, 3))
    dpos[:, :, 2] = -0.0006   # press into established contact
    dpos[:, :, 0] = 0.0002    # plus a tangential slide (friction chains)
    actions = (jnp.asarray(dpos), jnp.zeros((T_steps, n, 3)),
               jnp.zeros((T_steps, n)))
    _, buffers = stepper.simulate(spec, scene.params, scene.state0, actions)

    T = T_steps + 1
    NV, NH = spec.NV, spec.cloth.hinge_verts.shape[0]
    rng = np.random.default_rng(7)
    seed_pos = jnp.asarray(rng.normal(0, 1.0, (T, NV, 3)))
    seed_ar = jnp.asarray(rng.normal(0, 1.0, (T, NH))
                          * np.asarray(spec.cloth.hinge_mask))

    res = adjoint.backward(spec, scene.params, buffers, seed_pos, seed_ar)
    gg_o, pg0_o, _ = oracle_backward(scene, buffers, seed_pos, seed_ar)

    gg = np.asarray(res.gripper_grad)
    assert np.abs(gg_o).max() > 0
    np.testing.assert_allclose(gg, gg_o, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(res.pos_grad0), pg0_o,
                               rtol=1e-9, atol=1e-11)
