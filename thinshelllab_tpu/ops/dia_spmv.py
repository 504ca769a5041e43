"""Pallas TPU kernel for the hybrid-DIA SpMV (the CG hot loop).

The XLA formulation of the DIA matvec (stack 2P-padded dynamic slices, then
einsum) materializes an (n_off, 3, NVp) shifted tensor in HBM every
application and was measured ~16x off the HBM roofline (BASELINE.md round-2
traces: ~0.9 ms/apply at 71 offsets x 16.8k DOF, vs ~60 us to stream the
14 MB store once). This kernel streams the DIA store tile-by-tile at full
bandwidth with the x vector resident in VMEM and never materializes the
shifted copies.

Formulation (the "sublane-shift" layout that Mosaic accepts -- the round-2
attempt failed on unaligned lane-dim loads, see BASELINE.md): x lives as a
2D (sublane, lane) = (S, 128) image of the flat DOF vector. A row shift by
offset o = q*128 + r decomposes into
  * a STATIC lane rotation by r (pltpu.roll -- one per distinct r, hoisted
    out of the offset loop), and
  * two sublane-dynamic slices (rows s+q and s+q+1) blended by a lane mask
    (lane < 128 - r picks the carry-free half).
Sublane-dim dynamic slices are legal in Mosaic; nothing ever indexes the
lane dimension dynamically.

Layouts:
  dia_k : (n_off, 3, 3, NVp) f32, NVp = ceil((NV+1)/1024)*1024, viewed as
          (n_off, 3, 3, Spad, 128) and streamed in (n_off, 3, 3, S0, 128)
          blocks over the grid (S0 = 8 sublanes = 1024 rows per step).
  x2    : (3, NVp) column-masked input, zero beyond NV+1, viewed as
          (3, Spad, 128) and padded with Qpad zero sublanes on both sides.

Per grid step the kernel does n_off x 9 multiply-adds on (S0, 128) tiles:
arithmetic intensity ~0.25 FLOP/byte -- pure bandwidth, which is the point.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

L = 128   # TPU lane width
S0 = 8    # sublanes (rows of 128 DOFs) per grid step


def _spmv_acc(dia_ref, x_ref, base, offsets):
    """The shared DIA multiply-accumulate: returns (acc0, acc1, acc2)
    (S0, L) tiles of y = dia @ shifted(x) for the tile whose first DOF row
    sits at sublane `base` of the (already shift-padded) x_ref."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dt_ = x_ref.dtype
    lane = jax.lax.broadcasted_iota(jnp.int32, (S0, L), 1)
    acc0 = jnp.zeros((S0, L), dt_)
    acc1 = jnp.zeros((S0, L), dt_)
    acc2 = jnp.zeros((S0, L), dt_)
    for oi, o in enumerate(offsets):
        q, r = divmod(o, L)  # python floor semantics: 0 <= r < L
        if r == 0:
            # pure sublane shift: one dynamic ref read, no rotation
            sh = x_ref[:, pl.ds(base + q, S0), :]
        else:
            # read the minimal (S0+1)-row window from the VMEM-resident x
            # (dynamic slices are legal on refs, not on values), rotate the
            # lane dim by the blessed primitive, and blend the carry rows
            # with a static lane mask: rolled[l] = x[(l + r) mod L]
            w = x_ref[:, pl.ds(base + q, S0 + 1), :]
            # int32 shift: a python int lowers to an i64 'tpu.dynamic_rotate'
            # operand, which Mosaic rejects
            rw = pltpu.roll(w, jnp.int32(L - r), axis=2)
            sh = jnp.where((lane < L - r)[None], rw[:, :S0, :],
                           rw[:, 1 : S0 + 1, :])
        d = dia_ref[oi]  # (3, 3, S0, L)
        acc0 = acc0 + d[0, 0] * sh[0] + d[0, 1] * sh[1] + d[0, 2] * sh[2]
        acc1 = acc1 + d[1, 0] * sh[0] + d[1, 1] * sh[1] + d[1, 2] * sh[2]
        acc2 = acc2 + d[2, 0] * sh[0] + d[2, 1] * sh[1] + d[2, 2] * sh[2]
    return acc0, acc1, acc2


def _kernel(dia_ref, x_ref, y_ref, *, offsets, Qpad):
    from jax.experimental import pallas as pl

    i = pl.program_id(0)
    acc0, acc1, acc2 = _spmv_acc(dia_ref, x_ref, i * S0 + Qpad, offsets)
    y_ref[0] = acc0
    y_ref[1] = acc1
    y_ref[2] = acc2


def qpad_for(offsets) -> int:
    return max(abs(int(o)) for o in offsets) // L + 1


@partial(jax.jit, static_argnames=("offsets", "interpret"))
def dia_spmv(dia_k, x2, offsets, interpret=False):
    """y2[i, n] = sum_{j, o} dia_k[o, i, j, n] * x2[j, n + o].

    dia_k: (n_off, 3, 3, NVp) with NVp a multiple of S0*L; x2: (3, NVp),
    zero outside the real rows (shifts read zeros past either end).
    Returns (3, NVp)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_off = dia_k.shape[0]
    NVp = dia_k.shape[-1]
    Spad = NVp // L
    assert Spad % S0 == 0 and len(offsets) == n_off
    Qpad = qpad_for(offsets)
    Stot = Spad + 2 * Qpad

    xp = jnp.zeros((3, Stot, L), x2.dtype)
    xp = xp.at[:, Qpad : Qpad + Spad, :].set(x2.reshape(3, Spad, L))
    dia5 = dia_k.reshape(n_off, 3, 3, Spad, L)

    grid = (Spad // S0,)
    # The package runs with jax_enable_x64=True (CPU f64 tests); under x64
    # the BlockSpec index-map constants trace as i64 and this image's Mosaic
    # fails to legalize the resulting func.return (i64, ...) -- the round-2
    # blocker recorded in BASELINE.md. For f32 data (the TPU path) trace the
    # pallas_call under a scoped x64=off context; f64 data (CPU interpret
    # tests) must keep x64 on or the kernel silently computes in f32.
    if dia_k.dtype == jnp.float32:
        with jax.enable_x64(False):
            y = _call(dia5, xp, offsets, Qpad, n_off, Spad, NVp, grid,
                      x2.dtype, interpret)
    else:
        y = _call(dia5, xp, offsets, Qpad, n_off, Spad, NVp, grid,
                  x2.dtype, interpret)
    return y.reshape(3, NVp)


def _call(dia5, xp, offsets, Qpad, n_off, Spad, NVp, grid, dtype, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    return pl.pallas_call(
        partial(_kernel, offsets=tuple(int(o) for o in offsets), Qpad=Qpad),
        grid=grid,
        in_specs=[
            pl.BlockSpec((n_off, 3, 3, S0, L), lambda i: (0, 0, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # whole x, grid-invariant
        ],
        out_specs=pl.BlockSpec((3, S0, L), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, Spad, L), dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * n_off * NVp,
            bytes_accessed=(9 * n_off * NVp + 6 * NVp) * jnp.dtype(dtype).itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(dia5, xp)


# --------------------------------------------------------------------------
# Fused smoothed-block-Jacobi preconditioner
# --------------------------------------------------------------------------
#
# The CG preconditioner z = M^-1 r is the damped-Jacobi smoothing polynomial
#   z_0 = w D^-1 r;   z_{k+1} = z_k + w D^-1 (r - A' z_k)
# with A' the cheap in-band operator. As XLA ops this is ~7 HLOs per sweep
# (spmv + masks + 3x3 block einsums) x `smooth` sweeps per CG iteration --
# the step is dispatch-latency bound, so op count is the currency. This
# kernel runs the WHOLE polynomial as one pallas_call: grid (sweeps+1,
# tiles), z ping-ponged between two VMEM scratch buffers (a sweep must
# complete before the next reads shifted windows of it; TPU grids execute
# sequentially, last dim innermost, so sweep s finishes all tiles first).
#
# A' here is DIA(off != 0) + D on the 0-offset lane: the caller folds the
# FULL block diagonal D (inertia + contact + leftover diagonals included)
# into offset 0 of `dia_pre`. The leftover pull rows (irregular tactile/ball
# couplings, ~276 of 5605 rows at bench size) keep only their DIAGONAL in
# the smoother -- a preconditioner-quality approximation, still symmetric
# (A' and D^-1 both symmetric), so PCG stays valid.
#
# Frozen-DOF masking: inputs r with frozen rows zeroed keep z zero on frozen
# rows by induction (row-mask unf applied to A' z), identical to the XLA
# path's invariant.


def _precond_kernel(dia_ref, r_ref, unf_ref, dinv_ref, y_ref, za, zb, *,
                    offsets, Qpad, w, sweeps, ntiles):
    from jax.experimental import pallas as pl

    s = pl.program_id(0)
    i = pl.program_id(1)
    dt_ = r_ref.dtype

    @pl.when((s == 0) & (i == 0))
    def _zero_pads():
        pad = jnp.zeros((3, Qpad, L), dt_)
        za[:, :Qpad, :] = pad
        za[:, Qpad + ntiles * S0 :, :] = pad
        zb[:, :Qpad, :] = pad
        zb[:, Qpad + ntiles * S0 :, :] = pad

    r_t = r_ref[:, pl.ds(i * S0, S0), :]          # (3, S0, L)
    dv = dinv_ref[:, :, pl.ds(i * S0, S0), :]     # (3, 3, S0, L)

    def dinv_mul(s0, s1, s2):
        return (
            dv[0, 0] * s0 + dv[0, 1] * s1 + dv[0, 2] * s2,
            dv[1, 0] * s0 + dv[1, 1] * s1 + dv[1, 2] * s2,
            dv[2, 0] * s0 + dv[2, 1] * s1 + dv[2, 2] * s2,
        )

    def write(z_write, v0, v1, v2):
        z_write[0, pl.ds(i * S0 + Qpad, S0), :] = v0
        z_write[1, pl.ds(i * S0 + Qpad, S0), :] = v1
        z_write[2, pl.ds(i * S0 + Qpad, S0), :] = v2
        y_ref[0] = v0
        y_ref[1] = v1
        y_ref[2] = v2

    @pl.when(s == 0)
    def _sweep0():
        z0, z1, z2 = dinv_mul(r_t[0], r_t[1], r_t[2])
        write(za, w * z0, w * z1, w * z2)

    def sweep(z_read, z_write):
        a0, a1, a2 = _spmv_acc(dia_ref, z_read, i * S0 + Qpad, offsets)
        u = unf_ref[:, pl.ds(i * S0, S0), :]
        d0, d1, d2 = dinv_mul(r_t[0] - u[0] * a0, r_t[1] - u[1] * a1,
                              r_t[2] - u[2] * a2)
        zt = z_read[:, pl.ds(i * S0 + Qpad, S0), :]
        write(z_write, zt[0] + w * d0, zt[1] + w * d1, zt[2] + w * d2)

    # ping-pong by sweep parity (sweep 0 wrote za)
    for k in range(1, sweeps + 1):
        src, dst = (za, zb) if k % 2 == 1 else (zb, za)

        @pl.when(s == k)
        def _(src=src, dst=dst):
            sweep(src, dst)


@partial(jax.jit, static_argnames=("offsets", "w", "sweeps", "interpret"))
def dia_precond(dia_pre, r2, unf2, dinv, offsets, w, sweeps,
                interpret=False):
    """z = smoothed-block-Jacobi preconditioner applied to r, as ONE kernel.

    dia_pre: (n_off, 3, 3, NVp) with the FULL block diagonal D folded into
             the 0-offset lane (A' = off-band DIA + D).
    r2:   (3, NVp) residual, frozen rows + padding zeroed.
    unf2: (3, NVp) unfrozen row mask.
    dinv: (3, 3, NVp) per-row 3x3 inverse of D (zero past NV).
    Returns (3, NVp) = the polynomial z after `sweeps` damped sweeps."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_off = dia_pre.shape[0]
    NVp = dia_pre.shape[-1]
    Spad = NVp // L
    assert Spad % S0 == 0 and len(offsets) == n_off
    Qpad = qpad_for(offsets)
    ntiles = Spad // S0
    dt_ = r2.dtype

    dia5 = dia_pre.reshape(n_off, 3, 3, Spad, L)
    rp = r2.reshape(3, Spad, L)
    up = unf2.reshape(3, Spad, L)
    dvp = dinv.reshape(3, 3, Spad, L)

    kern = partial(
        _precond_kernel,
        offsets=tuple(int(o) for o in offsets),
        Qpad=Qpad,
        w=float(w),
        sweeps=int(sweeps),
        ntiles=ntiles,
    )

    def call():
        return pl.pallas_call(
            kern,
            grid=(sweeps + 1, ntiles),
            in_specs=[
                # sweep 0 never reads dia: park the fetcher on block 0 so the
                # first sweep streams the store only once
                pl.BlockSpec(
                    (n_off, 3, 3, S0, L),
                    lambda s, i: (0, 0, 0, jnp.where(s == 0, 0, i), 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(memory_space=pltpu.VMEM),  # r resident
                pl.BlockSpec(memory_space=pltpu.VMEM),  # unf resident
                pl.BlockSpec(memory_space=pltpu.VMEM),  # dinv resident
            ],
            out_specs=pl.BlockSpec((3, S0, L), lambda s, i: (0, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((3, Spad, L), dt_),
            scratch_shapes=[
                pltpu.VMEM((3, Spad + 2 * Qpad, L), dt_),
                pltpu.VMEM((3, Spad + 2 * Qpad, L), dt_),
            ],
            cost_estimate=pl.CostEstimate(
                flops=2 * 9 * n_off * NVp * sweeps + 2 * 9 * NVp * (sweeps + 1),
                bytes_accessed=(9 * n_off * NVp * sweeps + 24 * NVp)
                * jnp.dtype(dt_).itemsize,
                transcendentals=0,
            ),
            interpret=interpret,
        )(dia5, rp, up, dvp)

    if dt_ == jnp.float32:
        # same Mosaic i64 legalization workaround as dia_spmv above
        with jax.enable_x64(False):
            y = call()
    else:
        y = call()
    return y.reshape(3, NVp)
