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
from ..ops import spd
from . import elements, gridsolve


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
    tiny = jnp.finfo(jnp.result_type(det)).tiny
    inv_det = 1.0 / jnp.where(jnp.abs(det) > tiny, det, tiny)
    out = jnp.stack(
        [A11, A12, A13, A21, A22, A23, A31, A32, A33], axis=-1
    ).reshape(A.shape)
    return out * inv_det[..., None, None]


def solve_dense(spec: SceneSpec, groups, F):
    H = elements.dense_hessian(spec, groups)
    p = jnp.linalg.solve(H, F.reshape(-1))
    return p.reshape(-1, 3)


def prepare_solver_state(spec: SceneSpec, groups, dtype):
    """Arrays (no closures) holding everything the iterative solve needs:
    the DIA store / pull tables / preconditioner diagonals plus the fused
    blocks for the dynamic contact part. Carried through the Newton loop so
    modified-Newton iterations (spec.hess_refresh > 1) can reuse a stale
    operator without reassembling it."""
    st = {"H": groups["H"], "idx": jnp.asarray(groups["idx"])}
    if spec.dia is not None:
        st["dia"] = elements.assemble_dia(spec, groups, dtype)
        if spec.hvp_slots is not None and spec.hvp_slots.D > 0:
            st["nbr"] = elements.gather_neighbor_blocks(spec, groups, dtype)
        D, Dc = elements.diag_blocks_dia(spec, groups, st["dia"],
                                         st.get("nbr"), return_contact=True)
        st["D"], st["Dc"] = D, Dc
        ns = elements.static_block_count(spec)
        split = elements.build_contact_split(
            spec, st["idx"][ns:], groups["H"][ns:], dtype)
        if split is not None:
            st.update(split)
    elif spec.hvp_slots is not None:
        st["nbr"] = elements.gather_neighbor_blocks(spec, groups, dtype)
        st["D"] = elements.diag_blocks(spec, groups)
    else:
        st["D"] = elements.diag_blocks(spec, groups)
    return st


def _ops_from_state(spec: SceneSpec, st):
    groups = {"idx": st["idx"], "H": st["H"]}
    for k in ("Dcon", "idx_con", "H_con", "mm_S", "mm_H"):
        if k in st:
            groups[k] = st[k]
    if spec.dia is not None:
        nbr = st.get("nbr")

        def A(x):
            return elements.hvp_dia(spec, st["dia"], nbr, groups, x)

        def A_cheap(x):
            return elements.hvp_dia_static(spec, st["dia"], nbr, x) + \
                jnp.einsum("nij,nj->ni", st["Dc"], x)

        return A, A_cheap
    if spec.hvp_slots is not None:
        def A(x):
            return elements.hvp_pull(spec, st["nbr"], groups, x)

        return A, None

    def A(x):
        return elements.hvp(spec, groups, x)

    return A, None


def solve_cg(spec: SceneSpec, groups, F, x0=None):
    return solve_cg_prepared(
        spec, prepare_solver_state(spec, groups, F.dtype), F, x0=x0)


def _fused_precond_T(spec: SceneSpec, st, D, Dinv, w, smooth, dtype, unf2):
    """The damped block-Jacobi smoothing polynomial as ONE Pallas kernel
    (ops/dia_spmv.dia_precond) instead of ~7 HLOs x `smooth` sweeps per CG
    iteration, operating natively on (3, NVp) transposed vectors. The
    kernel's cheap operator is A' = off-band DIA + D with the FULL masked
    block diagonal D folded into the 0-offset lane; vs the XLA polynomial
    this drops only the leftover pull rows' OFF-diagonal couplings (their
    diagonal is inside D) -- a preconditioner-quality approximation, still
    symmetric, so PCG stays valid.

    Frozen DOFs decouple exactly: inside the kernel they stay zero (r and
    A'z both row-masked), and the XLA recurrence there is the scalar fixed
    point z_{k+1} = (1-w) z_k + w (dt^2/m) r, applied in closed form."""
    from ..ops import dia_spmv as _spmv

    plan = spec.dia
    off0 = plan.offsets.index(0)
    NV, NVp = spec.NV, plan.NVp
    unf = jnp.asarray(~spec.frozen, dtype)  # (NV, 3) per-DOF
    md = jnp.asarray(spec.mass)
    dia_pre = st["dia"].at[off0, :, :, :NV].set(jnp.transpose(D, (1, 2, 0)))
    dinv_l = jnp.zeros((3, 3, NVp), dtype).at[:, :, :NV].set(
        jnp.transpose(Dinv, (1, 2, 0)))
    coef = (spec.dt**2 / md)[:, None] * (1.0 - (1.0 - w) ** (smooth + 1))
    # frozen-DOF closed form folded into one (3, NVp) coefficient (zero at
    # unfrozen rows and in the padding)
    cf2 = jnp.zeros((3, NVp), dtype).at[:, :NV].set(
        (coef * (1.0 - unf)).T)

    def precond(r2):
        z2 = _spmv.dia_precond(dia_pre, r2 * unf2, unf2, dinv_l,
                               plan.offsets, w, smooth)
        return z2 * unf2 + cf2 * r2

    return precond


def solve_cg_prepared(spec: SceneSpec, st, F, return_iters=False, x0=None):
    """Block-Jacobi PCG on H p = F (H from element blocks, frozen-masked).

    When the spec carries static HvpSlots, the static element blocks are
    gathered once into a pull layout so each CG iteration is gather+einsum
    (no scatter) plus a small dynamic contact scatter.

    With a DIA plan the whole solve runs in the transposed (3, NVp) layout
    (_solve_cg_prepared_T): the only layout conversions are F at entry and
    x at exit, instead of per-iteration transposes inside the while_loop
    (the round-2 traces' multi-ms layout-thrash item).

    x0: optional warm start, applied as an optimally scaled base +
    correction solve (_warm_split); the stopping tolerance stays relative
    to the ORIGINAL |F| so the converged point matches the cold start."""
    if spec.dia is not None:
        return _solve_cg_prepared_T(spec, st, F, return_iters=return_iters,
                                    x0=x0)
    A, A_cheap = _ops_from_state(spec, st)
    D = st["D"]
    smooth = spec.precond_smooth if A_cheap is not None else 0

    Dinv = _inv3x3(D)  # (NV, 3, 3) closed-form adjugate (no LU custom call)

    if smooth > 0:
        w = spec.precond_omega

        def precond(r):
            # damped block-Jacobi smoothing of the cheap operator: a
            # fixed symmetric polynomial in D^-1 A_cheap, so still a
            # valid PCG preconditioner, but far closer to H^-1 than one
            # Jacobi sweep
            z = w * jnp.einsum("nij,nj->ni", Dinv, r)
            for _ in range(smooth):
                z = z + w * jnp.einsum(
                    "nij,nj->ni", Dinv, r - A_cheap(z)
                )
            return z
    else:
        def precond(r):
            return jnp.einsum("nij,nj->ni", Dinv, r)

    bnorm = jnp.linalg.norm(F)
    fwd_tol = spec.cg_tol if spec.fwd_tol is None else spec.fwd_tol
    tol2 = (fwd_tol * bnorm) ** 2 + jnp.finfo(jnp.result_type(bnorm)).tiny
    if x0 is not None:
        base, b = _warm_split(A, F, x0)
    else:
        base, b = None, F

    x_init = jnp.zeros_like(b)
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
        tiny = jnp.finfo(jnp.result_type(denom)).tiny
        alpha = rz / jnp.where(jnp.abs(denom) > tiny, denom, tiny)
        # breakdown guard: never poison x (the cond's finite check then
        # terminates on the stalled residual)
        alpha = jnp.where(jnp.isfinite(alpha), alpha, 0.0)
        x = x + alpha * p
        r = r - alpha * Ap
        z = precond(r)
        rz_new = jnp.sum(r * z)
        beta = rz_new / jnp.where(jnp.abs(rz) > tiny, rz, tiny)
        p = z + beta * p
        return x, r, z, p, rz_new, it + 1

    x, r, z, p, rz, it = jax.lax.while_loop(
        cond, body, (x_init, r0, z0, p0, rz0, 0))
    if base is not None:
        x = base + x
    if return_iters:
        return x, it
    return x


def _solve_cg_prepared_T(spec: SceneSpec, st, F, return_iters=False,
                         x0=None):
    """solve_cg_prepared in the transposed (3, NVp) layout: every carry of
    the CG while_loop (x, r, z, p) lives in the DIA matvec's native layout,
    so no (NV, 3) <-> (3, NVp) conversion exists inside the loop -- only F
    at entry and x at exit convert. Same math, same iteration counts; dot
    products reduce in a different order (f32-roundoff-level differences
    only)."""
    dtype = F.dtype
    unf2, m2 = elements.t2_consts(spec, dtype)
    nbr = st.get("nbr")
    groups = {"idx": st["idx"], "H": st["H"]}
    for k in ("Dcon", "idx_con", "H_con", "mm_S", "mm_H"):
        if k in st:
            groups[k] = st[k]
    DconT = (elements.blocks_to_t33(spec, st["Dcon"], dtype)
             if "Dcon" in st else None)

    def A(x2):
        return elements.hvp_dia_static_T(spec, st["dia"], nbr, x2, unf2,
                                         m2) + \
            elements.hvp_dia_contact_T(spec, groups, x2, unf2, DconT)

    D = st["D"]
    Dinv = _inv3x3(D)  # closed-form adjugate (no LU custom call)
    smooth = spec.precond_smooth
    if smooth > 0:
        w = spec.precond_omega
        if elements.use_pallas_spmv(spec, dtype):
            precond = _fused_precond_T(spec, st, D, Dinv, w, smooth, dtype,
                                       unf2)
        else:
            DinvT = elements.blocks_to_t33(spec, Dinv, dtype)
            DcT = elements.blocks_to_t33(spec, st["Dc"], dtype)

            def A_cheap(x2):
                return elements.hvp_dia_static_T(
                    spec, st["dia"], nbr, x2, unf2, m2
                ) + jnp.einsum("ijn,jn->in", DcT, x2)

            def precond(r2):
                z2 = w * jnp.einsum("ijn,jn->in", DinvT, r2)
                for _ in range(smooth):
                    z2 = z2 + w * jnp.einsum(
                        "ijn,jn->in", DinvT, r2 - A_cheap(z2)
                    )
                return z2
    else:
        DinvT = elements.blocks_to_t33(spec, Dinv, dtype)

        def precond(r2):
            return jnp.einsum("ijn,jn->in", DinvT, r2)

    bnorm = jnp.linalg.norm(F)
    fwd_tol = spec.cg_tol if spec.fwd_tol is None else spec.fwd_tol
    tol2 = (fwd_tol * bnorm) ** 2 + jnp.finfo(jnp.result_type(bnorm)).tiny
    b = elements.to_t2(spec, F)
    if x0 is not None:
        base, b = _warm_split(A, b, elements.to_t2(spec, x0))
    else:
        base = None

    x_init = jnp.zeros_like(b)
    r0 = b
    z0 = precond(r0)
    p0 = z0
    rz0 = jnp.sum(r0 * z0)

    def cond(carry):
        x, r, z, p, rz, it = carry
        rr = jnp.sum(r * r)
        return (rr > tol2) & jnp.isfinite(rr) & (it < spec.cg_max_iter)

    def body(carry):
        x, r, z, p, rz, it = carry
        Ap = A(p)
        denom = jnp.sum(p * Ap)
        tiny = jnp.finfo(jnp.result_type(denom)).tiny
        alpha = rz / jnp.where(jnp.abs(denom) > tiny, denom, tiny)
        alpha = jnp.where(jnp.isfinite(alpha), alpha, 0.0)
        x = x + alpha * p
        r = r - alpha * Ap
        z = precond(r)
        rz_new = jnp.sum(r * z)
        beta = rz_new / jnp.where(jnp.abs(rz) > tiny, rz, tiny)
        p = z + beta * p
        return x, r, z, p, rz_new, it + 1

    x2, r, z, p, rz, it = jax.lax.while_loop(
        cond, body, (x_init, r0, z0, p0, rz0, 0))
    if base is not None:
        x2 = base + x2
    x = elements.from_t2(spec, x2)
    if return_iters:
        return x, it
    return x


def _abs_element_blocks(H):
    """Element-wise matrix absolute value: each fused (4,4,3,3) block is
    reshaped to its 12x12 symmetric form, eigen-decomposed, and rebuilt with
    |eigenvalues|. |H_e| is PSD and spectrally equivalent to H_e away from
    its null directions -- the right building block for an SPD MINRES
    preconditioner of an indefinite assembled Hessian."""
    E = H.shape[0]
    H12 = H.transpose(0, 1, 3, 2, 4).reshape(E, 12, 12)
    H12 = 0.5 * (H12 + jnp.swapaxes(H12, -1, -2))
    w, v = jnp.linalg.eigh(H12)
    H12 = jnp.einsum("eik,ek,ejk->eij", v, jnp.abs(w), v)
    return H12.reshape(E, 4, 3, 4, 3).transpose(0, 1, 3, 2, 4)


def _warm_split(A, F, x0):
    """Optimally scaled warm start: alpha = argmin |F - a A x0|. Returns
    (base, b_eff) with base = alpha x0 and b_eff = F - A base, so the
    caller solves for the correction. |b_eff| <= |F| by construction -- a
    useless warm start degrades exactly to the cold start (alpha -> 0),
    never worse."""
    Ax0 = A(x0)
    den = jnp.sum(Ax0 * Ax0)
    tiny = jnp.finfo(jnp.result_type(den)).tiny
    alpha = jnp.sum(F * Ax0) / jnp.maximum(den, tiny)
    alpha = jnp.where(jnp.isfinite(alpha) & (den > tiny), alpha, 0.0)
    return alpha * x0, F - alpha * Ax0


def solve_minres(spec: SceneSpec, groups, F, return_iters=False, x0=None):
    """Preconditioned MINRES on H z = F for the adjoint's TRUE (unprojected,
    possibly indefinite) Hessian solves.

    The reference factors this system directly (sparse_solver.solve:85-105);
    plain PCG on it diverges when negative curvature is present and plain
    block-Jacobi MINRES stagnates at the iteration cap (measured rel
    residual 0.44 after 200 iters at bench size; the system is near-singular,
    cond ~2e5). MINRES handles symmetric indefinite systems at CG's
    per-iteration cost, but needs an SPD preconditioner spectrally close to
    |H|: we assemble a SECOND operator from the element-wise matrix absolute
    values |H_e| and solve its dominant cloth-grid part EXACTLY with the
    block-cyclic-reduction factorization (gridsolve.GridPreconditioner),
    block-Jacobi elsewhere. Scenes without a DIA cloth plan fall back to the
    damped block-Jacobi smoothing polynomial / plain block-Jacobi."""
    st = prepare_solver_state(spec, groups, F.dtype)
    A, _ = _ops_from_state(spec, st)
    base = None
    F_orig = F
    if x0 is not None:
        base, F = _warm_split(A, F, x0)

    # |H| preconditioner state (abs element blocks through the same
    # DIA/pull assembly)
    gprec = {"idx": groups["idx"], "H": _abs_element_blocks(groups["H"])}
    stp = prepare_solver_state(spec, gprec, F.dtype)
    _, A_pc_cheap = _ops_from_state(spec, stp)
    # |D|^-1 via the closed-form polynomial (no batched-eigh custom call
    # on the per-backward-step path -- spd.abs_inv_3x3)
    Dinv = spd.abs_inv_3x3(stp["D"])

    grid_plan = gridsolve.build_grid_plan(spec)
    smooth = spec.precond_smooth if A_pc_cheap is not None else 0
    if grid_plan and spec.dia is not None:
        # exact BCR solve of the |H| cloth tridiagonal (+ contact diagonal,
        # exact for frozen-body contacts); block-Jacobi elsewhere
        pre = gridsolve.GridPreconditioner(
            spec, grid_plan, stp["dia"], Dinv, stp.get("Dc")
        )
        M = pre.apply
    elif smooth > 0:
        wgt = spec.precond_omega

        def M(r):
            z = wgt * jnp.einsum("nij,nj->ni", Dinv, r)
            for _ in range(smooth):
                z = z + wgt * jnp.einsum(
                    "nij,nj->ni", Dinv, r - A_pc_cheap(z)
                )
            return z
    else:
        def M(r):
            return jnp.einsum("nij,nj->ni", Dinv, r)

    adj_tol = spec.cg_tol if spec.adj_tol is None else spec.adj_tol
    b = F
    y0 = M(b)
    tiny = jnp.finfo(F.dtype).tiny
    beta1 = jnp.sqrt(jnp.maximum(jnp.sum(b * y0), tiny))
    if base is None:
        tol = adj_tol * beta1
    else:
        # tolerance relative to the ORIGINAL rhs (one extra M apply on the
        # warm path), so warm and cold starts converge to the same point
        yF = M(F_orig)
        tol = adj_tol * jnp.sqrt(
            jnp.maximum(jnp.sum(F_orig * yF), tiny))
    d = F.dtype
    zero = jnp.zeros_like(b)

    # Paige-Saunders MINRES with left preconditioning (the scipy layout)
    def cond(c):
        (x, r1, r2, y, oldb, beta, dbar, epsln, phibar, cs, sn, w, w2,
         it) = c
        return (phibar > tol) & jnp.isfinite(phibar) & (it < spec.cg_max_iter)

    def body(c):
        (x, r1, r2, y, oldb, beta, dbar, epsln, phibar, cs, sn, w, w2,
         it) = c
        v = y / beta
        yv = A(v)
        yv = yv - jnp.where(it >= 1, beta / oldb, 0.0) * r1
        alfa = jnp.sum(v * yv)
        yv = yv - (alfa / beta) * r2
        r1n, r2n = r2, yv
        yn = M(r2n)
        oldbn = beta
        beta2 = jnp.sum(r2n * yn)
        betan = jnp.sqrt(jnp.maximum(beta2, tiny))
        oldeps = epsln
        delta = cs * dbar + sn * alfa
        gbar = sn * dbar - cs * alfa
        epsn = sn * betan
        dbarn = -cs * betan
        gamma = jnp.maximum(jnp.sqrt(gbar**2 + betan**2), tiny)
        csn = gbar / gamma
        snn = betan / gamma
        phi = csn * phibar
        phibarn = snn * phibar
        w1 = w2
        w2n = w
        wn = (v - oldeps * w1 - delta * w2n) / gamma
        xn = x + phi * wn
        return (xn, r1n, r2n, yn, oldbn, betan, dbarn, epsn, phibarn,
                csn, snn, wn, w2n, it + 1)

    init = (zero, b, b, y0, jnp.asarray(0.0, d), beta1, jnp.asarray(0.0, d),
            jnp.asarray(0.0, d), beta1, jnp.asarray(-1.0, d),
            jnp.asarray(0.0, d), zero, zero, 0)
    out = jax.lax.while_loop(cond, body, init)
    x = out[0] if base is None else base + out[0]
    if return_iters:
        return x, out[-1]
    return x


def solve_gmres(spec: SceneSpec, groups, F, x0=None, return_iters=False):
    """Right-preconditioned GMRES on H z = F for the adjoint's TRUE
    (unprojected) Hessian when the scene has a DIA cloth plan.

    Measured structure at bench size (scripts + /tmp diagnostics, round 2):
    the assembled H has only ~116 negative eigenvalues out of 15.8k DOF
    (invertible; the reference LDL-solves it, sparse_solver.py:85-105), but
    ~40% of ELEMENT blocks carry negative curvature -- so SPD
    preconditioners built from per-element PSD surrogates (|H_e|, clamps)
    are spectrally far from H and MINRES/CG stall at the iteration cap.
    GMRES has no SPD requirement on the preconditioner, so we precondition
    with the EXACT in-band operator: the block-cyclic-reduction
    factorization of the true cloth tridiagonal (+ contact diagonal, exact
    for frozen-body contacts), block-Jacobi elsewhere. M^-1 H = I + (small
    off-band perturbation) -> convergence in tens of iterations."""
    st = prepare_solver_state(spec, groups, F.dtype)
    A, _ = _ops_from_state(spec, st)
    # |D|^-1 via the closed-form polynomial (no batched-eigh custom call
    # on the per-backward-step path -- spd.abs_inv_3x3)
    Dinv = spd.abs_inv_3x3(st["D"])
    grid_plan = gridsolve.build_grid_plan(spec)
    if grid_plan and spec.dia is not None:
        ns = elements.static_block_count(spec)
        slot_lists = gridsolve.contact_coupling_slots(spec, grid_plan)
        dia_pc = gridsolve.add_contact_couplings(
            spec, grid_plan, slot_lists, st["dia"],
            groups["idx"][ns:], groups["H"][ns:],
        )
        pre = gridsolve.GridPreconditioner(
            spec, grid_plan, dia_pc, Dinv, st.get("Dc")
        )
        M = pre.apply
    else:
        def M(r):
            return jnp.einsum("nij,nj->ni", Dinv, r)
    restart = min(spec.cg_max_iter, 64)
    adj_tol = spec.cg_tol if spec.adj_tol is None else spec.adj_tol
    return _gmres_loop(A, M, F, adj_tol, restart, spec.cg_max_iter,
                       x0=x0, return_iters=return_iters)


def _gmres_loop(A, M, b, tol, m, max_total=None, x0=None,
                return_iters=False):
    """Right-preconditioned restarted GMRES(m). The total iteration budget is
    max_total (spec.cg_max_iter): a cycle that exhausts its m-slot basis
    without converging or stalling restarts from the true residual
    b - A x, so cg_max_iter is honored rather than silently truncated to one
    cycle. A cycle that exits via the stagnation test (8 non-improving
    iterations -- the f32 residual floor) stops the outer loop too: further
    restarts cannot improve on the floor.

    Each cycle solves A (M y) = r with per-iteration early exit
    (jax.scipy's 'batched' variant always runs the full restart cycle; at
    the f32 residual floor that wastes ~40% of the iterations).

    Modified Gram-Schmidt over a fixed (m+1)-slot basis buffer, Givens
    recurrence for the running residual estimate; the least-squares system
    is solved once at exit by back-substitution on the rotated H."""
    n = b.size
    d = b.dtype
    shape = b.shape
    b_f = b.reshape(-1)
    bnorm = jnp.linalg.norm(b_f)
    tol_abs = tol * bnorm
    if max_total is None:
        max_total = m

    def cycle(r):
        """One GMRES(m) cycle on A (M y) = r. Returns (dx, res, k, stalled).

        The classical per-iteration Givens recurrence replays k rotations
        on the new column (a dynamic fori_loop of scalar updates: O(m^2)
        SEQUENTIAL dispatches per cycle -- several ms of pure launch
        latency on a dispatch-bound step). Instead the accumulated rotation
        product Q (m+1, m+1) is carried dense: pre-rotating the new column
        is ONE tiny matvec, appending the new rotation is a 2-row update,
        and the final least-squares solve is one masked triangular solve."""
        beta = jnp.linalg.norm(r)
        V = jnp.zeros((m + 1, n), d)
        H = jnp.zeros((m + 1, m), d)
        Q = jnp.eye(m + 1, dtype=d)
        g = jnp.zeros((m + 1,), d)
        tiny = jnp.finfo(d).tiny
        V = V.at[0].set(r / jnp.maximum(beta, tiny))
        g = g.at[0].set(beta)

        def cond(carry):
            V, H, Q, g, k, res, best, stall = carry
            # stagnation exit: at the f32 residual floor (measured ~7e-4 at
            # bench size) the target tol may be unreachable; stop once 8
            # consecutive iterations fail to improve the best residual by 3%
            return (
                (res > tol_abs) & (k < m) & jnp.isfinite(res) & (stall < 8)
            )

        def body(carry):
            V, H, Q, g, k, _res, best, stall = carry
            v = jax.lax.dynamic_index_in_dim(V, k, keepdims=False)
            w = A(M(v.reshape(shape))).reshape(-1)
            # modified Gram-Schmidt against the filled basis (masked full
            # dot). The basis dots run at true-f32 MXU precision explicitly:
            # at the TPU default (bf16 passes) the projection coefficients
            # lose ~8 mantissa bits and the Krylov basis loses
            # orthogonality, directly bounding the attainable residual.
            hp = jax.lax.Precision.HIGHEST
            mask = (jnp.arange(m + 1) <= k).astype(d)
            h = jnp.matmul(V, w, precision=hp) * mask
            w = w - jnp.matmul(h, V, precision=hp)
            # one re-orthogonalization pass for f32 robustness
            h2 = jnp.matmul(V, w, precision=hp) * mask
            w = w - jnp.matmul(h2, V, precision=hp)
            h = h + h2
            wn = jnp.linalg.norm(w)
            h = h.at[k + 1].set(wn)
            V = V.at[k + 1].set(w / jnp.maximum(wn, tiny))
            # pre-rotate the raw column by the accumulated rotations
            Hc = Q @ h
            # new rotation to zero Hc[k+1]
            denom = jnp.sqrt(Hc[k] ** 2 + Hc[k + 1] ** 2)
            denom = jnp.maximum(denom, tiny)
            c_new = Hc[k] / denom
            s_new = Hc[k + 1] / denom
            Hc = Hc.at[k].set(denom).at[k + 1].set(0.0)
            H = H.at[:, k].set(Hc)
            rk = jax.lax.dynamic_slice_in_dim(Q, k, 2, axis=0)  # rows k, k+1
            rot = jnp.stack(
                [c_new * rk[0] + s_new * rk[1],
                 -s_new * rk[0] + c_new * rk[1]])
            Q = jax.lax.dynamic_update_slice_in_dim(Q, rot, k, axis=0)
            gk = g[k]
            g = g.at[k].set(c_new * gk).at[k + 1].set(-s_new * gk)
            res = jnp.abs(g[k + 1])
            improved = res < 0.97 * best
            best = jnp.minimum(best, res)
            stall = jnp.where(improved, 0, stall + 1)
            return V, H, Q, g, k + 1, res, best, stall

        V, H, Q, g, k, res, _best, stall = jax.lax.while_loop(
            cond, body, (V, H, Q, g, 0, beta, beta, 0)
        )

        # least-squares solve on the filled k x k upper triangle in ONE
        # triangular solve (unfilled rows/cols replaced by identity)
        filled = jnp.arange(m) < k
        fm = filled[:, None] & filled[None, :]
        T = jnp.where(fm, H[:m, :m], jnp.eye(m, dtype=d))
        rhs = jnp.where(filled, g[:m], 0.0)
        y = jax.scipy.linalg.solve_triangular(T, rhs, lower=False)
        y = jnp.where(filled, y, 0.0)
        dx = jnp.matmul(y, V[:m], precision=jax.lax.Precision.HIGHEST)
        return M(dx.reshape(shape)), res, k, stall >= 8

    def outer_cond(carry):
        _x, _r, res, tot, stalled = carry
        return (res > tol_abs) & jnp.isfinite(res) & (tot < max_total) \
            & (~stalled)

    def outer_body(carry):
        x, r, res_prev, tot, _stalled = carry
        dx, res_est, k, inner_stall = cycle(r)
        xn = x + dx.reshape(-1)
        rn = b_f - A(xn.reshape(shape)).reshape(-1)
        rn_norm = jnp.linalg.norm(rn)
        # f32-floor detection (one extra A-apply, no wasted cycle): in exact
        # arithmetic the Givens recurrence's estimate equals the true
        # residual norm (right preconditioning preserves it), so a true
        # residual an order of magnitude ABOVE the estimate means the
        # update's accuracy -- not the Krylov space -- is the binding
        # constraint (measured ~7e-4 relative at bench size, BASELINE.md).
        # Restarting cannot help; without this test every adjoint solve
        # whose tol sits below the floor burns a second full cycle
        # re-discovering it (the round-3 bench regression). The halving test
        # applies only to cycles whose estimate ALSO stalled (a cycle that
        # converges steadily but slowly -- e.g. 1.9x per 64-slot cycle --
        # keeps restarting up to the cg_max_iter total budget).
        floor = rn_norm > 10.0 * jnp.maximum(res_est, tol_abs)
        stalled = floor | (inner_stall & (rn_norm > 0.5 * res_prev))
        return xn, rn, rn_norm, tot + jnp.maximum(k, 1), stalled

    if x0 is not None:
        # optimally scaled warm start (see _warm_split): the first cycle
        # then solves for the correction; tolerance stays relative to |b|
        base, r0 = _warm_split(lambda v: A(v.reshape(shape)).reshape(-1),
                               b_f, x0.reshape(-1))
        init = (base, r0, jnp.linalg.norm(r0), 0, False)
    else:
        init = (jnp.zeros((n,), d), b_f, bnorm, 0, False)
    x, _r, _res, tot, _ = jax.lax.while_loop(outer_cond, outer_body, init)
    if return_iters:
        return x.reshape(shape), tot
    return x.reshape(shape)


def solve_linear(spec: SceneSpec, groups, F, x0=None):
    if spec.solver == "dense":
        return solve_dense(spec, groups, F)
    return solve_cg(spec, groups, F, x0=x0)


def solve_adjoint(spec: SceneSpec, groups, F, x0=None, return_iters=False):
    """Linear solve for the backward sweep: direct on the dense path;
    grid-preconditioned GMRES when a DIA cloth plan exists; MINRES with the
    |H| preconditioner otherwise (indefinite-safe).

    x0: optional warm start (the previous backward step's solution --
    adjacent steps' systems differ only by one quasi-static state update);
    applied with an optimal scalar scaling so it can never be worse than a
    cold start. Ignored on the exact dense path."""
    if spec.solver == "dense":
        x = solve_dense(spec, groups, F)
        return (x, jnp.asarray(0, jnp.int32)) if return_iters else x
    if spec.dia is not None and gridsolve.build_grid_plan(spec):
        return solve_gmres(spec, groups, F, x0=x0, return_iters=return_iters)
    return solve_minres(spec, groups, F, x0=x0, return_iters=return_iters)


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

    def line_search(pos, p, E0, soups=None, dsoups=None):
        # E(alpha) with all soup gathers hoisted out of the alpha loop --
        # same values as energy(pos - alpha p), no gathers (and no layout
        # flip) inside the while_loop. See elements.linesearch_energy_fn.
        # The micro loop passes pre-gathered soups so NOTHING is gathered
        # here at all.
        E_of = elements.linesearch_energy_fn(
            spec, params, pos, p, prev_pos, vel, ref_angle, contact,
            soups=soups, dsoups=dsoups,
        )

        def ls_cond(c):
            alpha, success, _E = c
            return (~success) & (alpha > spec.linesearch_min_alpha)

        def ls_body(c):
            alpha, _, _ = c
            E = E_of(alpha)
            success = E < E0
            return jnp.where(success, alpha, alpha * 0.5), success, E

        alpha, success, E_ls = jax.lax.while_loop(
            ls_cond, ls_body, (jnp.asarray(1.0, pos.dtype), False, E0)
        )
        # on failure the reference leaves the last tried step applied
        applied = jnp.where(success, alpha, alpha * 2.0)
        new_pos = pos - applied * p
        # E_ls IS E(applied) on both exits: success leaves (alpha, E(alpha))
        # in the carry; failure halves alpha AFTER computing E, so the
        # carried E belongs to alpha*2 = applied. (The loop always runs
        # >= 1 iteration since linesearch_min_alpha < 1.) No second
        # energy-graph copy in a cond branch.
        return new_pos, E_ls, applied

    refresh = max(1, spec.hess_refresh)
    if refresh > 1 and spec.solver != "dense":
        # modified Newton: rebuild the operator (Hessian blocks, DIA store,
        # preconditioner) every `refresh`-th iteration; in between, only the
        # residual is fresh. Same fixed point -- termination tests |p| with
        # p = H_stale^-1 F(x) and F -> 0 at the solution -- at roughly half
        # the per-iteration assembly cost.
        def op_of(pos):
            groups = elements.all_groups(spec, params, pos, ref_angle,
                                         contact, with_hess=True, spd=True)
            return prepare_solver_state(spec, groups, pos.dtype)

        # Outer loop over MACRO iterations: rebuild the operator
        # unconditionally, then run `refresh` guarded Newton iterations on
        # it. Same rebuild schedule (it = 0, refresh, 2*refresh, ...) and
        # fixed point as the previous lax.cond formulation, but without the
        # conditional: XLA conditionals copy their operands through the
        # false branch, and pass-through of the ~30 MB operator state
        # measured ~7 ms x 8/step at bench size (trace `conditional.28`).
        def cond2(carry):
            pos, E, F, it, delta, p_prev, soups = carry
            return (it < spec.max_newton_iter) & (delta >= spec.newton_tol)

        def ls_ef(pos, p, E0, soups, dsoups):
            """Backtracking line search on the FUSED energy+force
            evaluation (elements.linesearch_ef_fn): each trial costs the
            same as the old energy-only trial's gradient pass, and the
            accepted trial's force group is the next iteration's residual
            -- the separate per-iteration residual force pass is gone.
            Same alpha sequence and energies as the energy-only search."""
            EF = elements.linesearch_ef_fn(
                spec, params, pos, p, prev_pos, vel, ref_angle, contact,
                soups, dsoups)

            def ls_cond(c):
                alpha, success, _E, _g = c
                return (~success) & (alpha > spec.linesearch_min_alpha)

            def ls_body(c):
                alpha, _, _, _ = c
                E, g = EF(alpha)
                success = E < E0
                return jnp.where(success, alpha, alpha * 0.5), success, E, g

            # ONE copy of the EF graph in the HLO: the alpha=1.0 trial runs
            # as the loop's (always-executed) first iteration -- the carry
            # starts at (1.0, False, E0, dummy g) and linesearch_min_alpha
            # < 1 guarantees entry. Same alpha sequence and accepted (E, g)
            # as evaluating EF(1.0) outside: on success the carry holds
            # (alpha, E(alpha), g(alpha)); on failure alpha was halved
            # AFTER computing (E, g), so the carried values belong to
            # alpha*2 = applied.
            g_shape = jax.eval_shape(EF, jnp.asarray(1.0, pos.dtype))[1]
            alpha, success, E_ls, g_ls = jax.lax.while_loop(
                ls_cond, ls_body,
                (jnp.asarray(1.0, pos.dtype), False, E0,
                 jnp.zeros(g_shape.shape, g_shape.dtype)),
            )
            applied = jnp.where(success, alpha, alpha * 2.0)
            return pos - applied * p, E_ls, g_ls, applied

        def body2(carry):
            pos, E0, F, it, delta, p_prev, soups = carry
            op = op_of(pos)

            # fori_loop (not a Python unroll) over the guarded micro
            # iterations: ONE copy of the solve+line-search graph in the
            # HLO regardless of `refresh` (the unrolled form nearly
            # doubled whole-program compile time at refresh=2); `op` rides
            # along as a loop-invariant carry (aliased, not copied)
            def micro(_, c):
                pos, E0, F, it, delta, p_prev, soups = c
                # warm start from the previous Newton direction (optimally
                # scaled, never worse than cold -- _warm_split)
                p = solve_cg_prepared(spec, op, F, x0=p_prev)
                d_new = jnp.max(jnp.abs(p)) / spec.dt
                # ONE gather pass per micro iteration (the new direction
                # p): the line search reuses the carried position soups,
                # and the accepted position's soups are the affine update
                # soups - applied*dsoups (bit-identical to a fresh gather
                # -- see elements.gather_soups)
                dsoups = elements.gather_soups(spec, contact, p,
                                               direction=True)
                new_pos, E_new, g_new, applied = ls_ef(pos, p, E0, soups,
                                                       dsoups)
                F_new = elements.assemble_residual(
                    spec, {"idx": op["idx"], "g": g_new}, new_pos,
                    prev_pos, vel)
                cont = (it < spec.max_newton_iter) & (delta >= spec.newton_tol)
                new_soups = jax.tree.map(
                    lambda xs, ds: jnp.where(cont, xs - applied * ds, xs),
                    soups, dsoups)
                pos = jnp.where(cont, new_pos, pos)
                E0 = jnp.where(cont, E_new, E0)
                F = jnp.where(cont, F_new, F)
                delta = jnp.where(cont, d_new, delta)
                it = it + cont.astype(it.dtype)
                return pos, E0, F, it, delta, p, new_soups

            return jax.lax.fori_loop(0, refresh, micro,
                                     (pos, E0, F, it, delta, p_prev, soups),
                                     unroll=False)

        soups0 = elements.gather_soups(spec, contact, start)
        fg0 = elements.force_groups_from_soups(spec, params, soups0,
                                               ref_angle, contact)
        F0 = elements.assemble_residual(spec, fg0, start, prev_pos, vel)
        pos, _E, _F, it, delta, _p, _s = jax.lax.while_loop(
            cond2, body2,
            (start, energy(start), F0, jnp.asarray(0, jnp.int32),
             jnp.asarray(1e5, pos0.dtype), jnp.zeros_like(start), soups0),
        )
        return pos

    def cond(carry):
        pos, E, it, delta, p_prev = carry
        return (it < spec.max_newton_iter) & (delta >= spec.newton_tol)

    def body(carry):
        pos, E0, it, _, p_prev = carry
        groups = elements.all_groups(spec, params, pos, ref_angle, contact,
                                     with_hess=True, spd=True)
        F = elements.assemble_residual(spec, groups, pos, prev_pos, vel)
        # warm start from the previous Newton direction (optimally scaled,
        # never worse than cold -- _warm_split); no-op on the dense path
        p = solve_linear(spec, groups, F, x0=p_prev)
        delta = jnp.max(jnp.abs(p)) / spec.dt
        new_pos, E_new, _applied = line_search(pos, p, E0)
        return new_pos, E_new, it + 1, delta, p

    pos, _E, it, delta, _p = jax.lax.while_loop(
        cond, body,
        (start, energy(start), 0, jnp.asarray(1e5, pos0.dtype),
         jnp.zeros_like(start)),
    )
    return pos
