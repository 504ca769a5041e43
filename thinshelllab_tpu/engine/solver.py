"""Linear solvers and the damped line-searched Newton loop.

Replaces the reference's host-side Newton driver (BaseScene.time_step
:1327-1374 / newton_step :1159-1230) and its CuPy CSR spsolve backend
(engine/sparse_solver.py:85-105) with fully on-device XLA:

  * 'dense'  : assemble the (3NV)^2 Hessian and LU-solve (small scenes;
               an exact drop-in for the reference's direct solve).
  * 'cg'     : matrix-free block-Jacobi-preconditioned conjugate gradients
               over per-element Hessian blocks (large scenes; never
               materializes H).

Both run inside `lax.while_loop` -- the whole time step is one XLA program.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core.spec import SceneSpec
from . import elements


def _inv3x3(A):
    """Batched closed-form 3x3 inverse via the adjugate (VPU-friendly;
    avoids the batched-LU custom call)."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    A11 = e * i - f * h
    A12 = c * h - b * i
    A13 = b * f - c * e
    A21 = f * g - d * i
    A22 = a * i - c * g
    A23 = c * d - a * f
    A31 = d * h - e * g
    A32 = b * g - a * h
    A33 = a * e - b * d
    det = a * A11 + b * A21 + c * A31
    inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-300, det, 1e-300)
    out = jnp.stack(
        [A11, A12, A13, A21, A22, A23, A31, A32, A33], axis=-1
    ).reshape(A.shape)
    return out * inv_det[..., None, None]


def solve_dense(spec: SceneSpec, groups, F):
    H = elements.dense_hessian(spec, groups)
    p = jnp.linalg.solve(H, F.reshape(-1))
    return p.reshape(-1, 3)


def solve_cg(spec: SceneSpec, groups, F):
    """Block-Jacobi PCG on H p = F (H from element blocks, frozen-masked).

    When the spec carries static HvpSlots, the static element blocks are
    gathered once into a pull layout so each CG iteration is gather+einsum
    (no scatter) plus a small dynamic contact scatter."""
    smooth = 0
    if spec.dia is not None:
        dia = elements.assemble_dia(spec, groups, F.dtype)
        if spec.hvp_slots is not None and spec.hvp_slots.D > 0:
            nbr_left = elements.gather_neighbor_blocks(spec, groups, F.dtype)
        else:
            nbr_left = None
        D, Dc = elements.diag_blocks_dia(spec, groups, dia, nbr_left,
                                         return_contact=True)
        smooth = spec.precond_smooth

        def A(x):
            return elements.hvp_dia(spec, dia, nbr_left, groups, x)

        def A_cheap(x):
            # static part + contact block diagonal: the smoother operator
            return elements.hvp_dia_static(spec, dia, nbr_left, x) + \
                jnp.einsum("nij,nj->ni", Dc, x)
    elif spec.hvp_slots is not None:
        nbr = elements.gather_neighbor_blocks(spec, groups, F.dtype)
        D = elements.diag_blocks(spec, groups)

        def A(x):
            return elements.hvp_pull(spec, nbr, groups, x)
    else:
        D = elements.diag_blocks(spec, groups)

        def A(x):
            return elements.hvp(spec, groups, x)

    Dinv = _inv3x3(D)  # (NV, 3, 3) closed-form adjugate (no LU custom call)

    if smooth > 0:
        w = spec.precond_omega

        def precond(r):
            # damped block-Jacobi smoothing of the cheap operator: a fixed
            # symmetric polynomial in D^-1 A_cheap, so still a valid PCG
            # preconditioner, but far closer to H^-1 than one Jacobi sweep
            z = w * jnp.einsum("nij,nj->ni", Dinv, r)
            for _ in range(smooth):
                z = z + w * jnp.einsum(
                    "nij,nj->ni", Dinv, r - A_cheap(z)
                )
            return z
    else:
        def precond(r):
            return jnp.einsum("nij,nj->ni", Dinv, r)

    b = F
    bnorm = jnp.linalg.norm(b)
    tol2 = (spec.cg_tol * bnorm) ** 2 + 1e-300

    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = precond(r0)
    p0 = z0
    rz0 = jnp.sum(r0 * z0)

    def cond(carry):
        x, r, z, p, rz, it = carry
        rr = jnp.sum(r * r)
        # the finite guard stops cleanly on f32 underflow/breakdown instead
        # of poisoning x with NaNs
        return (rr > tol2) & jnp.isfinite(rr) & (it < spec.cg_max_iter)

    def body(carry):
        x, r, z, p, rz, it = carry
        Ap = A(p)
        denom = jnp.sum(p * Ap)
        alpha = rz / jnp.where(jnp.abs(denom) > 1e-300, denom, 1e-300)
        # breakdown guard: never poison x (the cond's finite check then
        # terminates on the stalled residual)
        alpha = jnp.where(jnp.isfinite(alpha), alpha, 0.0)
        x = x + alpha * p
        r = r - alpha * Ap
        z = precond(r)
        rz_new = jnp.sum(r * z)
        beta = rz_new / jnp.where(jnp.abs(rz) > 1e-300, rz, 1e-300)
        p = z + beta * p
        return x, r, z, p, rz_new, it + 1

    x, r, z, p, rz, it = jax.lax.while_loop(cond, body, (x0, r0, z0, p0, rz0, 0))
    return x


def solve_linear(spec: SceneSpec, groups, F):
    if spec.solver == "dense":
        return solve_dense(spec, groups, F)
    return solve_cg(spec, groups, F)


def newton_solve(spec: SceneSpec, params, pos0, prev_pos, vel, ref_angle, contact):
    """Minimize the incremental potential from pos0. Returns converged pos.

    Iteration structure mirrors the reference exactly: per iteration compute
    E0, residual and SPD-projected Hessian, solve H p = F, then backtracking
    line search halving alpha while E(x - alpha p) >= E0 (alpha > 1e-8);
    terminate when max|p|/dt < tol or the iteration cap is reached.

    Two pure optimizations on top (same fixed point, fewer iterations /
    energy evaluations): Newton starts from the inertia predictor x_hat
    (reference get_x_hat, BaseScene.py:1291-1314, used there only as the
    inertia target), and the accepted line-search energy is carried into the
    next iteration instead of being recomputed."""

    energy = partial(
        elements.total_energy,
        spec,
        params,
        prev_pos=prev_pos,
        vel=vel,
        ref_angle=ref_angle,
        contact=contact,
    )

    md = jnp.asarray(spec.mass)
    x_hat = pos0 + vel * spec.dt + (
        jnp.asarray(spec.gravity) + jnp.asarray(spec.ext_force) / md[:, None]
    ) * spec.dt**2
    start = jnp.where(jnp.asarray(spec.frozen), pos0, x_hat)

    def cond(carry):
        pos, E, it, delta = carry
        return (it < spec.max_newton_iter) & (delta >= spec.newton_tol)

    def body(carry):
        pos, E0, it, _ = carry
        groups = elements.all_groups(spec, params, pos, ref_angle, contact,
                                     with_hess=True, spd=True)
        F = elements.assemble_residual(spec, groups, pos, prev_pos, vel)
        p = solve_linear(spec, groups, F)
        delta = jnp.max(jnp.abs(p)) / spec.dt

        def ls_cond(c):
            alpha, success, _E = c
            return (~success) & (alpha > spec.linesearch_min_alpha)

        def ls_body(c):
            alpha, _, _ = c
            E = energy(pos - alpha * p)
            success = E < E0
            return jnp.where(success, alpha, alpha * 0.5), success, E

        alpha, success, E_ls = jax.lax.while_loop(
            ls_cond, ls_body, (jnp.asarray(1.0, pos.dtype), False, E0)
        )
        # on failure the reference leaves the last tried step applied
        applied = jnp.where(success, alpha, alpha * 2.0)
        new_pos = pos - applied * p
        E_new = jax.lax.cond(success, lambda: E_ls, lambda: energy(new_pos))
        return new_pos, E_new, it + 1, delta

    pos, _E, it, delta = jax.lax.while_loop(
        cond, body, (start, energy(start), 0, jnp.asarray(1e5, pos0.dtype))
    )
    return pos
