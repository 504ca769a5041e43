"""Block-cyclic-reduction (BCR) direct solver over cloth grids, used as the
SPD core of the iterative-solve preconditioners.

The assembled Hessian's dominant, worst-conditioned part is the cloth: a
regular (N+1) x (M+1) vertex grid whose static stencil spans at most two
grid rows/cols (13 DIA lanes, |di|,|dj| <= 2 -- see elements.build_dia_plan).
Grouping grid rows in pairs makes that operator BLOCK TRIDIAGONAL with
dense (6(M+1), 6(M+1)) blocks; cyclic reduction factors it in ceil(log2)
levels of *batched dense matmuls/inversions* -- exactly the shape the MXU
wants -- where a banded Cholesky would serialize over thousands of rows.

Used as a preconditioner: extract_cloth_tridiag builds the block tridiagonal
from a DIA store (|H| blocks for the adjoint MINRES, SPD-projected blocks
for the forward CG) plus the contact block diagonal -- which is EXACT for
contacts against fully frozen bodies (e.g. cloth-on-table: the source-face
rows are frozen, so only the target vertex's 3x3 diagonal survives).

The reference has no counterpart (it factors the full sparse matrix with
cuSPARSE, engine/sparse_solver.py:85-105); this is the TPU-native
replacement for that direct-solve role.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def build_grid_plan(spec):
    """Host-side plan: per cloth covered by the DIA store, the lane ->
    (di, dj) grid-shift decomposition. Returns a list of
    (N, M, v_off, lanes) with lanes = [(lane_index, di, dj), ...].

    The decomposition o = di*(M+1) + dj with |di|,|dj| <= 2 is unique for
    M+1 > 4; lanes that do not decompose inside the window carry no cloth
    values at cloth rows (they belong to tet bodies) and are skipped."""
    if spec.dia is None:
        return []
    plan = []
    offsets = spec.dia.offsets
    for (N, M, v_off, _fb, _hb, _fams, _res) in spec.dia.cloths:
        W = M + 1
        if W <= 4:
            continue
        lanes = []
        for oi, o in enumerate(offsets):
            for dj in range(-2, 3):
                if (o - dj) % W == 0:
                    di = (o - dj) // W
                    if abs(di) <= 2:
                        lanes.append((oi, di, dj))
                        break
        plan.append((N, M, v_off, tuple(lanes)))
    return plan


def contact_coupling_slots(spec, gp):
    """Host-side: for each planned cloth, the contact-constraint slot indices
    of non-self pairs whose SOURCE faces belong to that cloth. Those slots'
    source-face vertex pairs carry in-band couplings (face vertices share a
    grid cell) that belong in the cloth tridiagonal: at a draped state they
    are the same order of magnitude as the contact diagonal, and leaving
    them out of the preconditioner makes the Krylov iteration count scale
    with the active contact count."""
    faces = np.asarray(spec.faces)
    con = spec.contact
    out = []
    for (N, M, v_off, _lanes) in gp:
        lo, hi = v_off, v_off + (N + 1) * (M + 1)
        slots = []
        for (cq_start, count, f_start, _nf, is_self) in con.pair_desc:
            if is_self:
                continue
            f0 = faces[f_start]
            if np.all((f0 >= lo) & (f0 < hi)):
                slots.append(np.arange(cq_start, cq_start + count))
        out.append(
            np.concatenate(slots).astype(np.int32) if slots else None
        )
    return out


def add_contact_couplings(spec, gp, slot_lists, dia, con_idx, con_H):
    """Scatter the off-diagonal 3x3 blocks of cloth-source contact
    constraints into a COPY of the DIA store (their offsets +-1, +-(W-1),
    +-W, +-(W+1) are existing cloth lanes), so the tridiagonal extraction
    picks them up. con_idx (C, 4), con_H (C, 4, 4, 3, 3) are the merged
    barrier+friction group (masked-inactive blocks are zero). Invalid
    entries (vertex outside this cloth, missing lane) are dumped on the
    ghost row NV, which the extraction never reads."""
    offsets = spec.dia.offsets
    NV = spec.NV
    lanes_all, rows_all, vals_all = [], [], []
    for (N, M, v_off, _lanes), slots in zip(gp, slot_lists):
        if slots is None:
            continue
        W = M + 1
        R = N + 1
        span = 2 * W + 2
        lut = np.full((2 * span + 1,), -1, np.int32)
        for li, o in enumerate(offsets):
            if -span <= o <= span:
                lut[o + span] = li
        lut = jnp.asarray(lut)
        sl = jnp.asarray(slots)
        ii = con_idx[sl]  # (S, 4)
        for a in range(4):
            for b in range(4):
                if a == b:
                    continue
                va, vb = ii[:, a], ii[:, b]
                ina = (va >= v_off) & (va < v_off + R * W)
                inb = (vb >= v_off) & (vb < v_off + R * W)
                o = vb - va
                lane = lut[jnp.clip(o + span, 0, 2 * span)]
                ok = ina & inb & (lane >= 0)
                lanes_all.append(jnp.where(ok, lane, 0))
                rows_all.append(jnp.where(ok, va, NV))
                vals_all.append(
                    con_H[sl, a, b]
                    * ok[:, None, None].astype(con_H.dtype)
                )
    if not lanes_all:
        return dia
    lanes = jnp.concatenate(lanes_all)
    rows = jnp.concatenate(rows_all)
    vals = jnp.concatenate(vals_all)  # (S12, 3, 3)
    # advanced indices on non-adjacent axes (0 and 3) put the S12 batch dim
    # first, matching vals' layout
    return dia.at[lanes, :, :, rows].add(vals)


def extract_cloth_tridiag(spec, gp_entry, dia, Dc=None):
    """Build (D, U) for one cloth: D (nb, m, m) diagonal blocks, U (nb, m, m)
    super-diagonal couplings (U[k]: block k -> k+1; U[nb-1] unused/zero),
    with m = 6(M+1) and nb = ceil((N+1)/2) (odd N+1 padded with an identity
    scalar row-pair).

    Frozen DOFs are masked to zero rows/cols and the inertia diagonal
    mass/dt^2 is added for every real vertex (so frozen rows become pure
    inertia, matching hvp_dia_static's masking); padded rows get a unit
    diagonal. Dc (NV, 3, 3), when given, adds the dynamic contact block
    diagonal."""
    N, M, v_off, lanes = gp_entry
    W = M + 1
    R = N + 1
    nb = (R + 1) // 2
    Rp = 2 * nb
    dt_ = dia.dtype

    unf = jnp.asarray(~spec.frozen, dt_)[v_off : v_off + R * W]  # (RW, 3)
    unf_g = unf.reshape(R, W, 3).transpose(2, 0, 1)  # (3, R, W)

    eye_dj = {dj: jnp.asarray(np.eye(W, k=dj), dt_) for dj in range(-2, 3)}

    D = jnp.zeros((nb, 2, W, 3, 2, W, 3), dt_)
    L = jnp.zeros((nb, 2, W, 3, 2, W, 3), dt_)  # block k -> k-1 (for symmetrize)
    U = jnp.zeros((nb, 2, W, 3, 2, W, 3), dt_)

    for (oi, di, dj) in lanes:
        val = dia[oi, :, :, v_off : v_off + R * W].reshape(3, 3, R, W)
        # row mask (i-component at the row vertex)
        val = val * unf_g[:, None]
        # column mask: unfrozen at (r+di, c+dj), zero outside the grid
        cm = jnp.zeros((3, R + 4, W + 4), dt_)
        cm = cm.at[:, 2 : 2 + R, 2 : 2 + W].set(unf_g)
        cm = cm[:, 2 + di : 2 + di + R, 2 + dj : 2 + dj + W]
        val = val * cm[None, :]
        # pad rows to 2*nb
        if Rp > R:
            val = jnp.concatenate(
                [val, jnp.zeros((3, 3, Rp - R, W), dt_)], axis=2
            )
        for p in (0, 1):
            vp = val[:, :, p::2, :]  # (3, 3, nb, W)
            s = (p + di) // 2  # floor division: python semantics
            p2 = (p + di) - 2 * s
            band = jnp.einsum("ijkc,cd->kcidj", vp, eye_dj[dj])
            if s == 0:
                D = D.at[:, p, :, :, p2].add(band)
            elif s == 1:
                # rows in the last block coupling "up" are zero by assembly
                U = U.at[:, p, :, :, p2].add(band)
            elif s == -1:
                L = L.at[:, p, :, :, p2].add(band)
            # |s| == 2 impossible for |di| <= 2 with p in {0,1}:
            # (1+2)//2 == 1, (0-2)//2 == -1

    m = 6 * W
    D = D.reshape(nb, m, m)
    U = U.reshape(nb, m, m)
    L = L.reshape(nb, m, m)
    # enforce exact symmetry: T must be SPD for the MINRES preconditioner.
    # L[k] couples block k -> k-1, i.e. contributes to U[k-1]^T.
    D = 0.5 * (D + jnp.swapaxes(D, -1, -2))
    Lt = jnp.swapaxes(L, -1, -2)
    U = U.at[:-1].set(0.5 * (U[:-1] + Lt[1:]))

    # block-diagonal additions: inertia (+ contact diagonal)
    md = jnp.asarray(spec.mass, dt_)[v_off : v_off + R * W]  # (RW,)
    B = (
        md[:, None, None]
        / spec.dt**2
        * jnp.eye(3, dtype=dt_)[None]
    )  # (RW, 3, 3)
    if Dc is not None:
        unfm = unf[:, :, None] * unf[:, None, :]
        B = B + Dc[v_off : v_off + R * W] * unfm
    if Rp > R:
        pad = jnp.broadcast_to(jnp.eye(3, dtype=dt_), ((Rp - R) * W, 3, 3))
        B = jnp.concatenate([B, pad], axis=0)
    B = B.reshape(nb, 2 * W, 3, 3)
    q = 2 * W
    Dd = jnp.einsum("kqij,qr->kqirj", B, jnp.eye(q, dtype=dt_))
    D = D + Dd.reshape(nb, m, m)
    return D, U


def factor_tridiag(D, U, cutoff=4):
    """Cyclic-reduction factorization of the block tridiagonal (D_k, U_k).
    Returns the level stack + root inverse for solve_tridiag. Odd level
    sizes are padded with an identity block (decoupled).

    Reduction stops once <= `cutoff` blocks remain; the reduced system is
    inverted DENSELY (one (n_root*m)^2 inverse at factor time, one matvec
    per apply). The deepest levels are tiny-k einsum chains that cost
    dispatch latency, not FLOPs -- the apply inside the adjoint GMRES is a
    sequential per-iteration chain, so swapping ~2 levels (6 ops fwd + 6
    bwd) for one matvec shortens the critical path at negligible extra
    bytes (n_root*m ~ 1.7k rows at bench size).

    SPD caveat: the extracted cloth tridiagonal is the restriction of a PSD
    (inertia-augmented) operator, and restriction does NOT guarantee
    positive definiteness in general. For the shipped specs the mass/dt^2
    diagonal added in extract_cloth_tridiag dominates the dropped off-band
    couplings, but jnp.linalg.inv has no failure detection, so every pivot
    block gets a small relative diagonal shift (100 eps x its max |entry|):
    a near-singular or slightly indefinite pivot then yields a finite,
    slightly-damped preconditioner instead of silently poisoning it with
    inf/NaN. (The Krylov loops' isfinite guards would catch NaN only after
    the solve had already been wasted.)"""
    levels = []
    n = D.shape[0]
    m = D.shape[1]
    dt_ = D.dtype
    eps = 100.0 * jnp.finfo(dt_).eps

    def _safe_inv(A):
        scale = jnp.max(jnp.abs(A), axis=(-2, -1), keepdims=True)
        shift = eps * jnp.maximum(scale, jnp.finfo(dt_).tiny)
        k = A.shape[-1]
        return jnp.linalg.inv(A + shift * jnp.eye(k, dtype=dt_))

    while n > cutoff:
        padded = n % 2 == 1
        if padded:
            D = jnp.concatenate(
                [D, jnp.eye(m, dtype=dt_)[None]], axis=0
            )
            U = jnp.concatenate([U, jnp.zeros((1, m, m), dt_)], axis=0)
            n += 1
        n2 = n // 2
        Dodd_inv = _safe_inv(D[1::2])  # (n2, m, m)
        U_even = U[0::2]   # U_{2t}:   even -> odd (right neighbor)
        U_odd = U[1::2]    # U_{2t+1}: odd  -> even (next)
        G1 = jnp.einsum("kab,kbc->kac", U_even, Dodd_inv)
        G2 = jnp.einsum("kba,kbc->kac", U_odd, Dodd_inv)  # U_odd^T Dinv
        term_r = jnp.einsum("kab,kcb->kac", G1, U_even)   # G1 U_even^T
        term_l = jnp.einsum("kab,kbc->kac", G2, U_odd)    # G2 U_odd
        Dnew = D[0::2] - term_r
        Dnew = Dnew.at[1:].add(-term_l[:-1])
        Unew = -jnp.einsum("kab,kbc->kac", G1, U_odd)
        # pre-stack the apply-time operator pairs ONCE here (constant across
        # applies): the solve's forward correction uses [G1; G2] and the
        # back-substitution uses [U_even^T; U_odd[:-1]], each as a single
        # batched matvec dispatch inside the Krylov iteration
        G12 = jnp.concatenate([G1, G2], axis=0)
        UUT = jnp.concatenate(
            [jnp.swapaxes(U_even, -1, -2), U_odd[:-1]], axis=0)
        levels.append((Dodd_inv, G12, UUT, padded))
        D, U, n = Dnew, Unew, n2
    # dense root: assemble the remaining n-block tridiagonal and invert once
    B = jnp.zeros((n, n, m, m), dt_)
    ar = jnp.arange(n)
    B = B.at[ar, ar].set(D)
    if n > 1:
        B = B.at[ar[:-1], ar[1:]].set(U[:-1])
        B = B.at[ar[1:], ar[:-1]].set(jnp.swapaxes(U[:-1], -1, -2))
    T = B.transpose(0, 2, 1, 3).reshape(n * m, n * m)
    root_inv = _safe_inv(T)
    return levels, root_inv


def solve_tridiag(fac, b):
    """Solve T x = b given factor_tridiag output. b: (nb, m).

    The apply runs INSIDE the adjoint GMRES iteration, so it is pure
    critical-path latency: each level's pair of batched matvecs (G1 b_odd,
    G2 b_odd / U_even^T x, U_odd x) is STACKED along the batch dim into one
    einsum dispatch -- bit-identical values (the same per-k matvecs, just
    batched together), ~half the sequential op count per level."""
    levels, root_inv = fac
    stack = []
    for (Dodd_inv, G12, UUT, padded) in levels:
        if padded:
            b = jnp.concatenate([b, jnp.zeros((1, b.shape[1]), b.dtype)])
        b_odd = b[1::2]
        k = b_odd.shape[0]
        # one batched matvec for both correction terms (G12 = [G1; G2])
        t = jnp.einsum("kab,kb->ka", G12,
                       jnp.concatenate([b_odd, b_odd], axis=0))
        b_new = b[0::2] - t[:k]
        b_new = b_new.at[1:].add(-t[k:][:-1])
        stack.append(b_odd)
        b = b_new
    m = b.shape[1]
    n_root = root_inv.shape[0] // m
    x = (root_inv @ b[:n_root].reshape(-1)).reshape(n_root, m)
    for (Dodd_inv, G12, UUT, padded) in reversed(levels):
        b_odd = stack.pop()
        # x_odd[t] = Dinv_{2t+1} (b_odd[t] - U_{2t}^T x_{2t}
        #                                   - U_{2t+1} x_{2t+2})
        # with UUT = [U_even^T; U_odd[:-1]] applied in one stacked dispatch
        k = b_odd.shape[0]
        xx = jnp.concatenate([x, x[1:]], axis=0)
        t = jnp.einsum("kab,kb->ka", UUT, xx)
        rhs = b_odd - t[:k]
        rhs = rhs.at[:-1].add(-t[k:])
        x_odd = jnp.einsum("kab,kb->ka", Dodd_inv, rhs)
        n = x.shape[0] + x_odd.shape[0]
        xi = jnp.zeros((n, x.shape[1]), x.dtype)
        xi = xi.at[0::2].set(x)
        xi = xi.at[1::2].set(x_odd)
        x = xi[: n - 1] if padded else xi
    return x


class GridPreconditioner:
    """SPD preconditioner: exact BCR solve on each cloth's static tridiagonal
    block (+ contact diagonal), block-Jacobi (3x3 inverse) everywhere else.

    Built once per linear system (the operator is fixed within a Krylov
    solve); apply() is a fixed symmetric positive map, valid for both PCG
    and MINRES."""

    def __init__(self, spec, gp, dia, Dinv_rest, Dc=None, cutoff=None):
        if cutoff is None:
            # root-size sweep knob (scripts/probe_phase_costs.py): the apply
            # inside the Krylov loop is a LATENCY-bound chain of ~3 einsums
            # per BCR level; a larger dense root trades (cheap, HBM-bound)
            # root-matvec bytes for fewer sequential levels. A static spec
            # field (env override TSL_BCR_CUTOFF applied once at scene
            # build, core/builder.py) so the choice is part of the spec hash.
            cutoff = spec.bcr_cutoff
        self.spec = spec
        self.gp = gp
        self.Dinv_rest = Dinv_rest
        self.facs = []
        self.mask = np.zeros((spec.NV,), bool)
        for entry in gp:
            N, M, v_off, _ = entry
            D, U = extract_cloth_tridiag(spec, entry, dia, Dc)
            self.facs.append(factor_tridiag(D, U, cutoff=cutoff))
            self.mask[v_off : v_off + (N + 1) * (M + 1)] = True
        self.mask_j = jnp.asarray(self.mask)

    def apply(self, r):
        z = jnp.einsum("nij,nj->ni", self.Dinv_rest, r)
        z = jnp.where(self.mask_j[:, None], 0.0, z)
        for entry, fac in zip(self.gp, self.facs):
            N, M, v_off, _ = entry
            W, R = M + 1, N + 1
            nb = (R + 1) // 2
            rc = r[v_off : v_off + R * W].reshape(-1)  # (3RW,)
            if 2 * nb > R:
                rc = jnp.concatenate(
                    [rc, jnp.zeros(((2 * nb - R) * W * 3,), r.dtype)]
                )
            xc = solve_tridiag(fac, rc.reshape(nb, 6 * W))
            xc = xc.reshape(-1)[: R * W * 3].reshape(R * W, 3)
            z = z.at[v_off : v_off + R * W].set(xc)
        return z
