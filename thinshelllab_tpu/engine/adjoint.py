"""Trajectory adjoint: implicit-function-theorem backward pass.

Faithful TPU-native re-derivation of the reference's hand-written backward
(engine/analytic_grad_single.py:217-257 and analytic_grad_system.py:115-160):

per step t (descending from T-1 to 1):
  1. clamp accumulated dL/dx_t and dL/dref_t to +-1000
  2. rebuild the step's contact set at the begin-of-step state x_{t-1}
     (latched projection state carried through the backward sweep)
  3. plastic chain a2ax: dL/dref_t flows to dL/dref_{t-1} and, scaled by the
     yield indicator (1 inside yield, 0.1 leak otherwise), into dL/dx_t
     through dtheta/dx (model_fold_offset.ref_angle_backprop_a2ax:1180-1209)
  4. solve H(x_t) z = dL/dx_t with the true (unprojected) Hessian
  5. frozen-column products -> effector 6-DoF gradients (gather_grad)
  6. x_hat_grad = M z / dt^2; chain dL/dx_{t-1} += (1+damping) x_hat_grad,
     dL/dx_{t-2} -= damping x_hat_grad (unfrozen DOFs)
  7. friction pressure + rest-offset chains into dL/dx_{t-1}
     (BaseScene.contact_energy_backprop:682-730)
  8. bending ref chain x2a: dL/dref_{t-1} += -z . dF/dref
  9. physical-parameter gradients: dL/dp -= z . dF/dp via one vjp w.r.t.
     Params (generalizes analytic_grad_system.get_parameters_grad:69-79 and
     Scene_sliding.contact_energy_backprop_friction to every parameter)
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.spec import ContactSet, Params, SceneSpec
from ..ops import collision, energies
from ..utils.quaternion import quat_to_rotmat
from . import elements, solver


class AdjointResult(NamedTuple):
    gripper_grad: jnp.ndarray  # (T, n_part, 6)
    param_grad: Params
    pos_grad0: jnp.ndarray     # residual dL/dx_0 (diagnostic)


def _two_sum(a, b):
    """Error-free transformation: s + e == a + b exactly (Knuth TwoSum,
    branch-free, 6 flops). Valid in any IEEE round-to-nearest arithmetic;
    XLA's TPU/CPU pipelines do not reassociate float adds, so the
    compensation term survives compilation (asserted by
    tests/test_adjoint.py::test_two_sum_survives_jit)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def _comp_add(hi, lo, x):
    """Compensated accumulate: (hi, lo) + x with one TwoSum; rounding of the
    running sum lands in lo instead of being discarded."""
    s, e = _two_sum(hi, x)
    return s, lo + e


def _rebuild_contact(spec, params, pos_prev, proj_flag, proj_dir):
    vn = collision.vertex_normals(pos_prev, spec.faces, spec.NV)
    proj_flag, proj_dir, tri, w = collision.projection_query(
        spec, pos_prev, vn, proj_flag, proj_dir
    )
    contact = collision.contact_analysis(
        spec, params.mu_pairs, pos_prev, pos_prev, proj_flag, proj_dir, tri, w
    )
    return contact, proj_flag, proj_dir


def _hinge_grads(spec, pos):
    """Per-hinge dtheta/dx over the stencil, masked. -> (NH, 4, 3), theta."""
    c = spec.cloth
    x = pos[c.hinge_verts]
    x = jnp.where(c.hinge_mask[:, None, None], x,
                  elements._CANON_STENCIL.astype(pos.dtype)[None])
    sel = jnp.asarray(c.hinge_sel, pos.dtype)
    th_fn = lambda xh, stc: energies.hinge_angle(xh, stc)
    theta = jax.vmap(th_fn)(x, sel)
    dth = jax.vmap(jax.grad(th_fn))(x, sel)
    m = c.hinge_mask.astype(pos.dtype)
    return dth * m[:, None, None], theta


def _contact_energy_backprop(spec, contact: ContactSet, pos_t, z):
    """Friction pressure-chain + rest-offset chain into dL/dx_{t-1}
    (reference BaseScene.contact_energy_backprop:682-730)."""
    idx = contact.idx  # (C, 4)
    w = contact.w
    T = contact.T
    k = contact.k
    mu = contact.mu
    eh = spec.eps_v * spec.dt

    x = pos_t[idx]
    u, r = elements.friction_slip(spec, contact, x)
    tiny = jnp.finfo(jnp.result_type(r)).tiny
    f1 = elements.friction_f1(spec, r)
    g1 = jnp.einsum("ct,cti->ci", u * (k * f1)[:, None], T)  # friction force dir

    active = contact.active.astype(pos_t.dtype)
    zc = z[idx]  # (C, 4, 3)

    # pressure chain: w1 = [w0, w1, w2, -1]
    wA = jnp.concatenate([w, -jnp.ones((w.shape[0], 1), w.dtype)], axis=1)
    tiny = jnp.finfo(jnp.result_type(k)).tiny
    pressure = k / jnp.where(jnp.abs(mu) > tiny, mu, tiny)
    safe_p = jnp.where(jnp.abs(pressure) > tiny, pressure, tiny)
    s1 = jnp.einsum("ca,ci,cai->c", wA, g1, zc) / safe_p  # sum zT * dfdp
    contrib_p = (
        (s1 * spec.k_contact)[:, None, None]
        * wA[:, :, None]
        * contact.n[:, None, :]
    )

    # rest-offset chain: w1 = [-w0, -w1, -w2, 1]
    wB = jnp.concatenate([-w, jnp.ones((w.shape[0], 1), w.dtype)], axis=1)
    f1p = jnp.where(r > eh, -1.0 / jnp.maximum(r, tiny) ** 2, -1.0 / eh**2)
    coef = jnp.where(r > 1e-9, f1p / jnp.maximum(r, 1e-9), 0.0)
    h = f1[:, None, None] * jnp.eye(2, dtype=pos_t.dtype) + coef[:, None, None] * jnp.einsum(
        "ct,cs->cts", u, u
    )
    h1 = k[:, None, None] * jnp.einsum("cti,cts,csj->cij", T, h, T)
    zv = jnp.einsum("ca,cai->ci", wB, zc)  # (C, 3)
    contrib_d = wB[:, :, None] * jnp.einsum("ci,cij->cj", zv, h1)[:, None, :]

    total = (contrib_p + contrib_d) * active[:, None, None]
    out = jnp.zeros_like(pos_t)
    out = out.at[idx].add(total)
    return out


def static_friction_loss_pos_grad(spec, contact: ContactSet, pos_t,
                                  f_loss_ratio):
    """Slip-penalty loss seed: dL/dx_t += f_loss_ratio * k * (T^T u) at every
    sticking contact whose tangential displacement exceeds 0.9*dt*eps_v
    (reference BaseScene.static_friction_loss:733-776; dormant call site
    analytic_grad_single.py:231). The Scene_pick.py:194 override's pressure
    term telescopes to zero analytically (its weight vector [w0,w1,w2,-1]
    sums to 0 for barycentric w), so the base form is the whole surface."""
    idx, w, T, k = contact.idx, contact.w, contact.T, contact.k
    x = pos_t[idx]
    u, r = elements.friction_slip(spec, contact, x)
    gate = contact.active & (r > spec.dt * spec.eps_v * 0.9)
    u3 = jnp.einsum("ct,cti->ci", u, T)  # back to 3D: T^T u
    w1 = jnp.concatenate([-w, jnp.ones((w.shape[0], 1), w.dtype)], axis=1)
    coef = jnp.where(gate, k * f_loss_ratio, 0.0)
    contrib = coef[:, None, None] * w1[:, :, None] * u3[:, None, :]
    return jnp.zeros_like(pos_t).at[idx].add(contrib)


def _gather_gripper_grad(spec, rot_t, pad_local_t, tmp_z_frozen):
    """(n_part, 6) from the frozen-column vector (reference gather_grad)."""
    g = spec.gripper
    d = tmp_z_frozen.dtype
    if g.mode == "none":
        return jnp.zeros((0, 6), d)
    d_pos = jnp.zeros((g.n_part, 3), d)
    d_ang = jnp.zeros((g.n_part, 3), d)
    R = quat_to_rotmat(rot_t)
    for p in range(g.n_pads):
        part = g.pad_part[p]
        gidx = g.pad_offset[p] + g.bound_idx
        grad = tmp_z_frozen[gidx]
        arm = jnp.einsum("ij,vj->vi", R[part], pad_local_t[p, g.bound_idx])
        d_pos = d_pos.at[part].add(jnp.sum(grad, axis=0))
        d_ang = d_ang.at[part].add(jnp.sum(jnp.cross(arm, grad), axis=0))
    denom = float((2 if g.mode == "paired" else 1) * g.n_bound)
    d_pos = jnp.clip(d_pos / denom, -10.0, 10.0)
    clip_a = 10.0 if g.mode == "paired" else 100.0
    d_ang = jnp.clip(d_ang / denom, -clip_a, clip_a)
    return jnp.concatenate([d_pos, d_ang], axis=1)


def _param_residual_vjp(spec, contact, pos_t, ref_t, z_masked, params):
    """-z . dF/dparams with F the residual at pos_t; the friction scale k is
    re-derived from mu so the friction-coefficient chain is captured."""
    pressure = contact.k / jnp.where(
        jnp.abs(contact.mu) > jnp.finfo(pos_t.dtype).tiny, contact.mu,
        jnp.finfo(pos_t.dtype).tiny
    )

    def residual_of_params(p: Params):
        mu = p.mu_pairs[spec.contact.cq_mu_id]
        con = ContactSet(
            active=contact.active,
            idx=contact.idx,
            w=contact.w,
            n=contact.n,
            k=mu * pressure,
            mu=mu,
            dx0=contact.dx0,
            T=contact.T,
        )
        fused = elements.all_groups(spec, p, pos_t, ref_t, con,
                                    with_hess=False, spd=False)
        Fp = jnp.zeros((spec.NV + 1, 3), pos_t.dtype)
        Fp = Fp.at[fused["idx"]].add(fused["g"])
        return jnp.where(jnp.asarray(spec.frozen), 0.0, Fp[: spec.NV])

    _, vjp = jax.vjp(residual_of_params, params)
    (pg,) = vjp(-z_masked)
    return pg


def backward(
    spec: SceneSpec,
    params: Params,
    buffers,
    seed_pos_grad,
    seed_ar_grad,
    damping_grad: float = 1.0,
    vertical_only: bool = False,
    with_param_grad: bool = False,
    skip_steps: int = 0,
    friction_loss: bool = False,
    f_loss_ratio: float = 0.001,
    warm_start: bool = False,
    debug_iters: bool = False,
    chain_dtype=None,
    solve_dtype=None,
    matmul_precision="solves",
    compensated: bool = False,
) -> AdjointResult:
    """Run the backward sweep over a simulated trajectory.

    matmul_precision: jax matmul precision for the backward sweep. On TPU
    the DEFAULT f32 matmul precision uses bf16 MXU passes, which was the
    dominant ON-CHIP adjoint error: measured adjoint-isolated gripper-grad
    rel err vs the f64 oracle on the same tape (bench24, round 5) 5.5e-2 at
    default -> 1.9e-3 at "highest". "highest" everywhere costs ~10%
    throughput (on-chip A/B: 4.56 vs 5.07 steps/s -- the Hessian-assembly
    jacfwd einsums are the MXU-bound part); the default "solves" scopes
    true-f32 to the adjoint linear solves + backward chain einsums only,
    keeping the element-Hessian assembly at the ambient precision. Pass
    None to inherit ambient precision everywhere, or any jax precision
    string to apply it to the whole sweep. The FORWARD step keeps the
    default (its inexactness is absorbed by the line search and |p|
    termination).

    buffers: dict from stepper.simulate. seed_pos_grad: (T, NV, 3) dL/dx_t
    seeds; seed_ar_grad: (T, NH) dL/dref_t seeds. skip_steps stops the sweep
    early (reference trajopt_interact skips the first 5 frames).
    Returns gripper_grad (T, n_part, 6) and accumulated Params cotangent.

    warm_start: seed each step's iterative adjoint solve with the previous
    (t+1) step's solution, optimally scaled (solver._warm_split), without
    changing what the solve converges to (no-op on the dense path). Default
    OFF: measured at bench size (scripts/ab_warmstart.py) successive adjoint
    solutions are uncorrelated (92 vs 93 GMRES iters) and the extra A-apply
    makes the warm path slightly slower. The forward Newton CG warm start
    (solver.newton_solve) is where the win is (-20% CG iterations).
    debug_iters: also return per-step adjoint-solve iteration counts in
    place of pos_grad0 (diagnostic).
    compensated: carry the dL/dx and dL/dref chain accumulators as
    (value, error) two-float pairs with error-free TwoSum accumulation — an
    ALGORITHMIC precision promotion for the backward chain carries on
    hardware where f64 is unavailable (the TPU silently demotes f64;
    BASELINE.md round-4). The dL/dref carry is a true running sum over all
    T steps (the plastic a2ax pass-through), which is where compensation
    can pay; the dL/dx carries are ≤2-step chains compensated for free.
    Identical in exact arithmetic; default OFF pending the measured A/B
    (scripts/grad_accuracy.py GRAD_ACC_COMP=1).
    chain_dtype / solve_dtype: precision-substitution knobs (default: the
    spec dtype for both). chain_dtype promotes the backward CHAIN arithmetic
    -- the dL/dx and dL/dref carries, the plastic a2ax/x2a hinge chains, the
    damping/friction accumulations -- while solve_dtype controls the Hessian
    assembly + adjoint linear solve. Used to isolate which f32 stage bounds
    the plastic-scene gradient error (BASELINE.md round-4 substitution
    table); the solve converges to the same point either way.
    """
    T = seed_pos_grad.shape[0]
    NV = spec.NV
    d = spec.dtype
    cd = chain_dtype if chain_dtype is not None else d
    sd = solve_dtype if solve_dtype is not None else d
    # a requested promotion wider than the enabled precision would silently
    # degrade to a no-op (astype(float64) stays f32 with x64 off -- the TPU
    # default per CLAUDE.md) and "measure" zero effect; fail loudly instead
    for _name, _dt in (("chain_dtype", cd), ("solve_dtype", sd)):
        if (jnp.dtype(_dt).itemsize > jnp.dtype(d).itemsize
                and jnp.dtype(_dt) == jnp.dtype(jnp.float64)
                and not jax.config.jax_enable_x64):
            raise ValueError(
                f"{_name}={_dt} requires jax_enable_x64 (float64 silently "
                f"demotes to float32 otherwise)")
    return _dispatch_body(
        matmul_precision, spec, params, buffers, seed_pos_grad, seed_ar_grad,
        damping_grad, vertical_only, with_param_grad, skip_steps,
        friction_loss, f_loss_ratio, warm_start, debug_iters, cd, sd,
        compensated)


def backward_chunked(
    spec: SceneSpec,
    params: Params,
    buffers,
    seed_pos_grad,
    seed_ar_grad,
    chunk: int,
    damping_grad: float = 1.0,
    vertical_only: bool = False,
    with_param_grad: bool = False,
    skip_steps: int = 0,
    friction_loss: bool = False,
    f_loss_ratio: float = 0.001,
    warm_start: bool = False,
    debug_iters: bool = False,
    chain_dtype=None,
    solve_dtype=None,
    matmul_precision="solves",
    compensated: bool = False,
) -> AdjointResult:
    """backward() in host-stitched segments of `chunk` steps: the backward
    scan runs as several short jitted programs with the adjoint carry
    crossing segment boundaries unchanged, so the result is bit-identical
    to backward() (tests/test_adjoint_chunked.py).

    The counterpart of stepper.simulate_chunked for the BACKWARD sweep:
    this image's TPU worker kernel-faults on certain long/large
    single-program scans, and the 40k-tri bench crash is backward-only
    (BASELINE.md round-5 triage). A ragged tail segment costs one extra
    compile (different scan length)."""
    if chunk < 1:
        raise ValueError(f"chunk={chunk} must be >= 1")
    T = seed_pos_grad.shape[0]
    NV = spec.NV
    d = spec.dtype
    cd = chain_dtype if chain_dtype is not None else d
    sd = solve_dtype if solve_dtype is not None else d
    for _name, _dt in (("chain_dtype", cd), ("solve_dtype", sd)):
        if (jnp.dtype(_dt).itemsize > jnp.dtype(d).itemsize
                and jnp.dtype(_dt) == jnp.dtype(jnp.float64)
                and not jax.config.jax_enable_x64):
            raise ValueError(
                f"{_name}={_dt} requires jax_enable_x64 (float64 silently "
                f"demotes to float32 otherwise)")

    seg_fn = jax.jit(lambda carry, ts_seg: _dispatch_body(
        matmul_precision, spec, params, buffers, seed_pos_grad,
        seed_ar_grad, damping_grad, vertical_only, with_param_grad,
        skip_steps, friction_loss, f_loss_ratio, warm_start, debug_iters,
        cd, sd, compensated, ts=ts_seg, carry_in=carry, raw=True))

    carry = (
        jnp.zeros((NV, 3), cd),
        jnp.zeros((NV, 3), cd),
        jnp.zeros(seed_ar_grad[0].shape, cd),
        jnp.asarray(buffers["final_proj_flag"]),
        jnp.asarray(buffers["final_proj_dir"]),
        jax.tree.map(jnp.zeros_like, params),
        jnp.zeros((NV, 3), sd),
    )
    if compensated:
        carry = carry + (jnp.zeros((NV, 3), cd),
                         jnp.zeros(seed_ar_grad[0].shape, cd))

    ts_full = jnp.arange(T - 1, 0, -1)
    gg_parts, it_parts = [], []
    for i in range(0, T - 1, chunk):
        carry, ggs, iters = seg_fn(carry, ts_full[i : i + chunk])
        gg_parts.append(ggs)
        it_parts.append(iters)
    g1, pgrad = carry[0], carry[5]
    if compensated:
        g1 = g1 + carry[7]

    n_part = max(spec.gripper.n_part, 1)
    gripper_grad = jnp.zeros((T, n_part, 6), d)
    if spec.gripper.n_part > 0 and gg_parts:
        gripper_grad = gripper_grad.at[ts_full].set(
            jnp.concatenate(gg_parts, axis=0))
    iters_all = (jnp.concatenate(it_parts, axis=0) if it_parts
                 else jnp.zeros((0,), jnp.int32))
    return AdjointResult(gripper_grad=gripper_grad, param_grad=pgrad,
                         pos_grad0=iters_all if debug_iters else g1)


def _dispatch_body(matmul_precision, *args, **kwargs):
    """Apply backward()'s matmul-precision policy around _backward_body:
    'solves' scopes true-f32 to the solve/chain regions; a jax precision
    string applies globally; None inherits ambient."""
    if matmul_precision == "solves":
        return _backward_body(*args, **kwargs, solve_prec="highest")
    if matmul_precision is not None:
        with jax.default_matmul_precision(matmul_precision):
            return _backward_body(*args, **kwargs)
    return _backward_body(*args, **kwargs)


def _backward_body(spec, params, buffers, seed_pos_grad, seed_ar_grad,
                   damping_grad, vertical_only, with_param_grad, skip_steps,
                   friction_loss, f_loss_ratio, warm_start, debug_iters,
                   cd, sd, comp=False, solve_prec=None, ts=None,
                   carry_in=None, raw=False):
    import contextlib

    def prec_ctx():
        """Scoped true-f32 matmul region ('solves' mode): the adjoint
        linear solve (GMRES orthogonalization dots, BCR factorization and
        applies) and the backward chain einsums -- the accuracy-critical
        matmuls -- at precision 'highest'; no-op otherwise."""
        if solve_prec is None:
            return contextlib.nullcontext()
        return jax.default_matmul_precision(solve_prec)
    T = seed_pos_grad.shape[0]
    NV = spec.NV
    d = spec.dtype
    c = spec.cloth
    kb = params.kb[c.hinge_cloth]
    k_angle = jnp.asarray(c.k_angle, cd)[c.hinge_cloth]
    d_ref_coef = (-2.0 * kb * c.hinge_coef).astype(cd)  # dtheta_ref (model_fold_offset:1150)
    unfrozen = (~spec.frozen).astype(cd)
    n_part = max(spec.gripper.n_part, 1)
    zero_params = jax.tree.map(jnp.zeros_like, params)

    def cast_float(tree, dt_):
        return jax.tree.map(
            lambda x: x.astype(dt_)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, tree)

    def step_fn(carry, t):
        if comp:
            (g1, g2, ar1, proj_flag, proj_dir, pgrad, z_prev,
             g1e, ar1e) = carry
        else:
            g1, g2, ar1, proj_flag, proj_dir, pgrad, z_prev = carry
        pos_t = buffers["pos"][t]
        pos_tm1 = buffers["pos"][t - 1]
        # Reference parity: copy_pos_and_refangle(self, step) loads
        # ref_angle_buffer[step - 1] (BaseScene.py:290, the copy_refangle
        # call uses step - 1) = the post-update ref of step t-1 = the ref
        # angle step t's energy actually used. The Hessian and the plastic
        # a2ax yield gate are both evaluated at this PRE-update (w.r.t.
        # step t) ref angle.
        ref_t = buffers["ref_angle"][t - 1]

        if comp:
            # collapse the (value, error) dL/dx carry into the solve seed
            # with ONE rounding (vs the 3-4 cascaded roundings of the plain
            # path); the dL/dref carry keeps its split alive across the clip
            # (void where the clamp pins the value, which is exact anyway)
            s, e = _two_sum(seed_pos_grad[t].astype(cd), g1)
            pg_t = jnp.clip(s + (e + g1e), -1000.0, 1000.0)
            ar_hi, ea = _two_sum(seed_ar_grad[t].astype(cd), ar1)
            ar_lo = ea + ar1e
            ar_tot = ar_hi + ar_lo
            clipped = jnp.abs(ar_tot) >= 1000.0
            ar_t = jnp.clip(ar_tot, -1000.0, 1000.0)
            ar_hi = jnp.where(clipped, ar_t, ar_hi)
            ar_lo = jnp.where(clipped, 0.0, ar_lo)
        else:
            pg_t = jnp.clip(seed_pos_grad[t].astype(cd) + g1,
                            -1000.0, 1000.0)
            ar_t = jnp.clip(seed_ar_grad[t].astype(cd) + ar1,
                            -1000.0, 1000.0)

        if "contact" in buffers:
            # taped forward contact set (stepper.simulate save_contacts=True,
            # index t-1 = the set step t's solve used): skips the whole
            # per-backward-step broadphase + contact-analysis replay AND
            # differentiates exactly the contact set the forward minimized
            # with (the reference's replay, analytic_grad_single.py:225,
            # rebuilds from the PRE-action step t-1 positions -- an
            # approximation forced by Taichi's memory model)
            contact = jax.tree.map(lambda x: x[t - 1], buffers["contact"])
        else:
            contact, proj_flag, proj_dir = _rebuild_contact(
                spec, params, pos_tm1, proj_flag, proj_dir
            )
        contact_c = cast_float(contact, cd) if cd != d else contact

        if friction_loss:  # reference AnalyticGrad(friction_loss=True)
            pg_t = pg_t + static_friction_loss_pos_grad(
                spec, contact_c, pos_t.astype(cd), f_loss_ratio
            )

        # plastic chain a2ax at (pos_t, ref_t). The yield gate is the same
        # predicate the forward's update_ref_angle evaluated at step t
        # (pos_t vs ref_{t-1}); when the tape carries the forward's
        # decisions, reuse them -- differentiating the forward that
        # actually ran -- instead of re-deriving a threshold comparison
        # that can flip at reduced precision on hinges near the yield
        # surface (the measured source of the plastic-scene f32 adjoint
        # error, BASELINE.md round-3 table). Identical in exact arithmetic
        # to the reference's recompute (ref_angle_backprop_a2ax:1180-1209).
        with prec_ctx():
            dth, theta = _hinge_grads(spec, pos_t.astype(cd))
        if "yield_gate" in buffers:
            yielded = buffers["yield_gate"][t]
        else:
            yielded = jnp.abs(theta - ref_t.astype(cd)) > k_angle
        factor = jnp.where(yielded, 1.0, 0.1) * c.hinge_mask
        contrib = (ar_t * factor)[:, None, None] * dth
        pg_t = pg_t.at[c.hinge_verts].add(contrib)
        if comp:
            # mask products are exact (0/1), so the split survives the
            # pass-through; the per-step x2a contribution lands via TwoSum
            ar_next = ar_hi * c.hinge_mask
            ar_next_lo = ar_lo * c.hinge_mask
        else:
            ar_next = ar_t * c.hinge_mask  # dL/dref_{t-1} pass-through

        # true Hessian at pos_t, solve H z = pg_t
        groups = elements.all_groups(
            spec, params if sd == d else cast_float(params, sd),
            pos_t.astype(sd), ref_t.astype(sd),
            contact if sd == d else cast_float(contact, sd),
            with_hess=True, spd=False)
        # the true Hessian can be indefinite: GMRES/MINRES on the iterative
        # path, warm-started from the previous step's solution
        with prec_ctx():
            z, it = solver.solve_adjoint(
                spec, groups, pg_t.astype(sd),
                x0=z_prev if warm_start else None, return_iters=True)
            z_c = z.astype(cd)

            tmp_z_frozen = elements.frozen_column_product(spec, groups, z)
            x_hat_grad = z_c * (spec.mass / spec.dt**2)[:, None].astype(cd) \
                * unfrozen

            bp = _contact_energy_backprop(spec, contact_c, pos_t.astype(cd),
                                          z_c)

            # bending ref chain x2a: dL/dref_{t-1} += -d_ref*(z . dtheta/dx)
            z_dth = jnp.einsum("hai,hai->h", z_c[c.hinge_verts], dth)
            if comp:
                ar_next, ar_next_lo = _comp_add(
                    ar_next, ar_next_lo,
                    (-d_ref_coef) * z_dth * c.hinge_mask)
            else:
                ar_next = ar_next + (-d_ref_coef) * z_dth * c.hinge_mask

            gg = _gather_gripper_grad(
                spec, buffers["gripper_rot"][t], buffers["pad_local"][t],
                tmp_z_frozen,
            )
        if vertical_only:
            gg = gg * jnp.array([0.0, 0, 1, 0, 0, 0], d)[None, :]

        if with_param_grad:
            z_masked = (z_c * unfrozen).astype(d)
            pg_contrib = _param_residual_vjp(
                spec, contact, pos_t, ref_t, z_masked, params
            )
            pgrad = jax.tree.map(jnp.add, pgrad, pg_contrib)

        g2_out = -damping_grad * x_hat_grad
        if comp:
            h, e1 = _two_sum(g2, (1.0 + damping_grad) * x_hat_grad)
            g1_out, e2 = _two_sum(h, bp)
            g1e_out = e1 + e2  # g2 is a fresh single product (no carry err)
        else:
            g1_out = g2 + (1.0 + damping_grad) * x_hat_grad + bp
        active = t > skip_steps
        gg = jnp.where(active, gg, 0.0).astype(d)
        out_carry = (g1_out, g2_out, ar_next, proj_flag, proj_dir, pgrad, z)
        if comp:
            out_carry = out_carry + (g1e_out, ar_next_lo)
        return out_carry, (gg, it)

    if carry_in is None:
        init = (
            jnp.zeros((NV, 3), cd),
            jnp.zeros((NV, 3), cd),
            jnp.zeros(seed_ar_grad[0].shape, cd),
            buffers["final_proj_flag"],
            buffers["final_proj_dir"],
            zero_params,
            jnp.zeros((NV, 3), sd),
        )
        if comp:
            init = init + (jnp.zeros((NV, 3), cd),
                           jnp.zeros(seed_ar_grad[0].shape, cd))
    else:
        init = carry_in
    if ts is None:
        ts = jnp.arange(T - 1, 0, -1)
    fin, (ggs, iters) = jax.lax.scan(step_fn, init, ts)
    if raw:
        return fin, ggs, iters
    g1, pgrad = fin[0], fin[5]
    if comp:
        g1 = g1 + fin[7]  # residual dL/dx_0 diagnostic: collapse the split

    gripper_grad = jnp.zeros((T, n_part, 6), d)
    if spec.gripper.n_part > 0:
        gripper_grad = gripper_grad.at[ts].set(ggs)
    return AdjointResult(gripper_grad=gripper_grad, param_grad=pgrad,
                         pos_grad0=iters if debug_iters else g1)
