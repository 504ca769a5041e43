"""SceneSpec / Params / SimState: the static+dynamic decomposition of a scene.

Reference mapping (Genesis-Embodied-AI/ThinShellLab):
  * BaseScene's Taichi fields with per-body offsets (BaseScene.py:69-195)
    become flat jnp arrays over one global vertex soup.
  * Material bodies become element "soups": one face soup for all cloths,
    one hinge soup for all dihedrals, and two tet soups (stable-neo-Hookean
    "offset" variant, model_elastic_offset.py; tactile variant,
    model_elastic_tactile.py).
  * Contact pair declarations (BaseScene.contact_analysis :818-835 and scene
    overrides) become a static directed-pair table with a fixed-capacity
    query/constraint buffer (one slot per (source body, target vertex)).
  * Differentiable physical parameters (Kl/Ka/Kb per cloth, mu/lambda per
    elastic group, friction coefficients per pair) live in Params.
  * Time-varying data (positions, velocities, plastic reference angles,
    latched contact sides, gripper pose) lives in SimState.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
import numpy as np

from ..utils.pytree import pytree_dataclass, static_field


@pytree_dataclass
class ClothSoup:
    """All cloth faces/hinges of the scene, concatenated."""

    # faces
    f2v: Any            # (NFc, 3) int32 global vertex ids
    cloth_id: Any       # (NFc,) int32
    l0: Any             # (NFc, 3) rest edge lengths (edge l: f2v[l] -> f2v[(l+1)%3])
    rest_area: Any      # (NFc,)
    # hinges: flattened (face, l) pairs, NH = 3 * NFc, raster order
    hinge_verts: Any    # (NH, 4) int32: [v0, v1, v2, v3] stencil
    hinge_sel: Any      # (NH, 4, 4) one-hot selection -- see energies.hinge_angle
    hinge_mask: Any     # (NH,) bool: active hinge (counter_face > face)
    hinge_coef: Any     # (NH,) dx^2 / 3 bending coefficient (without Kb)
    hinge_cloth: Any    # (NH,) int32
    counter_face: Any   # (NFc, 3) int32 (soup-global face id; -1/stale when inactive)
    counter_point: Any  # (NFc, 3) int32
    # geometry metadata
    n_cloths: int = static_field(default=0)
    NV_per: Tuple[int, ...] = static_field(default=())
    N: Tuple[int, ...] = static_field(default=())
    M: Tuple[int, ...] = static_field(default=())
    offsets: Tuple[int, ...] = static_field(default=())        # global vertex offset
    face_offsets: Tuple[int, ...] = static_field(default=())   # offset into soup
    k_angle: Tuple[float, ...] = static_field(default=())      # plastic yield per cloth
    dx: Tuple[float, ...] = static_field(default=())


@pytree_dataclass
class TetSoup:
    tets: Any      # (T, 4) int32 global vertex ids
    B: Any         # (T, 3, 3) rest shape-matrix inverse
    W: Any         # (T,) rest volume
    group: Any     # (T,) int32 index into the soup's (mu, lam) param arrays


@pytree_dataclass
class ContactSpec:
    """Directed contact pair table + fixed-capacity query buffer.

    Pair p: project vertices of body tgt(p) onto faces of body src(p) with
    friction coefficient params.mu_pairs[mu_id(p)].
    """

    cq_vert: Any    # (C,) int32 global target vertex id
    cq_pair: Any    # (C,) int32 pair index
    cq_mu_id: Any   # (C,) int32 index into params.mu_pairs
    cq_fstart: Any  # (C,) int32 first face of the source body
    cq_nf: Any      # (C,) int32 number of faces of the source body
    cq_self: Any    # (C,) bool: self-contact query (same body; skips faces
                    # containing the query vertex, face-interior only --
                    # reference engine/geometry_self.py:166-298)
    n_pairs: int = static_field(default=0)
    capacity: int = static_field(default=0)
    max_src_faces: int = static_field(default=0)
    top_k: int = static_field(default=32)
    # queries are processed in chunks of this size (bounds the transient
    # (chunk, max_src_faces) broadphase distance matrix)
    query_chunk: int = static_field(default=512)
    # static per-pair descriptors: (cq_start, cq_count, f_start, n_faces,
    # is_self) -- lets the broadphase sweep each pair against only its own
    # source faces instead of a padded max
    pair_desc: Tuple = static_field(default=())
    # per-pair spatial-hash descriptor: None (dense L-inf sweep) or
    # (Gx, Gy, Gz, cap): counting-sort the pair's source-face centroids into
    # a static (Gx*Gy*Gz)-cell grid of cell size 2*grid_h and gather <= cap
    # faces from each of a query's 27 neighbor cells -- the TPU-shaped
    # analogue of the reference's uniform-grid broadphase
    # (engine/geometry.py:96-163): work scales with queries + faces, not
    # queries x faces. Grid dims come from the REST extent (+margin); cell
    # coords are clamped into the grid at runtime, which keeps candidate
    # supersets correct (out-of-range content merges into boundary cells).
    hash_desc: Tuple = static_field(default=())
    # minimum source-face count for a pair to USE its hash descriptor at
    # query time. Measured on the TPU (scripts/ab_step_hash.py, round 3):
    # the hash's 27*cap candidate GATHERS are index-rate limited (~0.5G
    # idx/s) while the dense L-inf sweep is pure vectorized elementwise, so
    # dense wins up to ~10k faces (219 vs 235 ms/step at bench size) and
    # the crossover sits in the tens of thousands. Descriptors are still
    # built from 2048 faces up so tests/large scenes can engage the path.
    hash_min_faces: int = static_field(default=32768)
    # static per-pair flag: True when EVERY vertex of the pair's source-face
    # set is fully frozen (e.g. cloth queries against a rigid table). For
    # such pairs the masked contact Hessian block reduces to the query
    # vertex's own (3, 3) diagonal block -- all face rows/columns vanish --
    # so their per-CG-iteration gather/scatter collapses into a per-vertex
    # diagonal accumulated once per operator build
    # (elements.contact_static_split). In the bench scene this removes the
    # ~half of contact slots that carry the resting cloth.
    frozen_src: Tuple = static_field(default=())
    # static per-pair (v_offset, n_verts) of the SOURCE body's vertex range.
    # Lets the contact matvec turn a pair's face-side gather/scatter into
    # selection matmuls over the source body's (bounded) vertex slice
    # (elements.contact_static_split 'mm' classification): on TPU the
    # gather/scatter is index-rate limited (~100 ns/index, the top per-CG-
    # iteration cost in the round-3/5 device traces) while a one-hot
    # selection matmul of the same coupling rides the MXU.
    src_vrange: Tuple = static_field(default=())
    # element-count budget for a pair's (count*3, n_src_verts) selection
    # matrix; pairs above it (e.g. cloth self-contact) stay on the
    # gather/scatter path. 0 disables the matmul path entirely (A/B knob;
    # env override TSL_CONTACT_MM applied once at scene build).
    mm_budget: int = static_field(default=8_000_000)


@pytree_dataclass
class GripperSpec:
    """Rigid 6-DoF (+opening) effector owning tactile pads.

    mode 'paired': two pads per part (gripper_tactile.py); 'single': one pad
    per part (gripper_single.py); 'none': no effector.
    """

    bound_idx: Any         # (nb,) int32 pad-local ids of driven (frozen) verts
    pad_rest: Any          # (n_pad_verts, 3) scaled rest positions (ratio applied)
    mode: str = static_field(default="none")
    n_part: int = static_field(default=0)
    n_pads: int = static_field(default=0)
    pad_offset: Tuple[int, ...] = static_field(default=())  # global vertex offset/pad
    pad_part: Tuple[int, ...] = static_field(default=())
    pad_sign: Tuple[int, ...] = static_field(default=())    # +1 upper, -1 lower
    pad_flip: Tuple[bool, ...] = static_field(default=())   # rest mirrored (z-flip)
    n_pad_verts: int = static_field(default=0)
    n_bound: int = static_field(default=0)


@pytree_dataclass
class DiaPlan:
    """Hybrid DIA (diagonal) storage plan for the regular part of the static
    Hessian. Dense offsets (cloth grid + cube lattices: dozens of distinct
    row->col vertex offsets covering ~all blocks) assemble into an
    (n_off, 3, 3, NVp) diagonal array once per Newton iteration; a CG
    iteration is then static shifts against that store (a Pallas streaming
    kernel on TPU, ops/dia_spmv.py; padded-slice einsum elsewhere). Rare
    offsets (irregular tactile/ball tets) stay on the pull path.

    Assembly is scatter/gather-free for the dominant regular part (XLA TPU
    gathers/scatters move ~4 bytes per 2ns -- see BASELINE.md): cloth faces
    and hinges are raster-ordered over the (N, M) cell grid, so each
    (parity, class, a, b) family lands in its offset lane by a constant 2D
    shift -- a static slice-add. Lattice/tactile tets (a tiny fraction of
    blocks) use a compact per-row gather + one-hot MXU placement; anything
    irregular stays on the pull path (leftover mask)."""

    # tet sub-assembly: compact row gather + one-hot placement
    row_tab: Any    # (Rn, Dr) int32 packed e*4 + a; sentinel = n_static*4
    o_idx: Any      # (Rn, Dr*4) int32 dense-offset id; n_off = discard
    rows: Any       # (Rn,) int32 global vertex row ids
    # residual fallback for cloth classes that failed stencil verification
    extra_ea: Any   # (X,) int32 packed e*4 + a
    extra_rows: Any # (X,) int32 global vertex rows
    offsets: Tuple[int, ...] = static_field(default=())
    max_abs_off: int = static_field(default=0)
    Dr: int = static_field(default=0)
    # padded DOF-row count of the DIA store: ceil((NV+1)/1024)*1024, so the
    # store reshapes losslessly to the Pallas kernel's (Spad, 128) image
    NVp: int = static_field(default=0)
    # per-cloth stencil families:
    # (N, M, v_off, f_base, h_base, fams, res_fams) with
    # fams entries  (kind, c, a, b, o_id, i0, i1, j0, j1, di, dj, parity)
    # res_fams      (kind, c, a,       i0, i1, j0, j1, di, dj, parity)
    cloths: Tuple = static_field(default=())


@pytree_dataclass
class HvpSlots:
    """Static pull-based sparsity for the matrix-free Hessian product.

    For every vertex v, slots[v] lists the static element blocks whose ROW is
    v: slot_e indexes the fused element-block array, slot_ab packs (a*4+b),
    slot_col is the column vertex. Built once at scene construction; per
    Newton iteration the blocks are gathered into a dense (NV+1, D, 3, 3)
    neighbor array so each CG iteration is gather+einsum with no scatter."""

    slot_e: Any    # (R, D) int32 index into fused static blocks
    slot_ab: Any   # (R, D) int32 packed a*4+b
    slot_col: Any  # (R, D) int32 column vertex (NV = zero pad)
    row_ids: Any   # (R,) int32 rows with at least one slot (compact)
    D: int = static_field(default=0)


@pytree_dataclass
class SceneSpec:
    # global vertex soup
    mass: Any       # (NV,)
    gravity: Any    # (NV, 3)
    ext_force: Any  # (NV, 3)
    frozen: Any     # (NV, 3) bool
    faces: Any      # (F, 3) int32 (all bodies' surface triangles)
    hvp_slots: Any  # HvpSlots or None (pull path / DIA leftover)
    dia: Any        # DiaPlan or None (hybrid DIA for the regular offsets)
    cloth: ClothSoup
    neo: TetSoup    # stable-neo-Hookean elastics (table/box/ball)
    tact: TetSoup   # tactile-pad elastics
    contact: ContactSpec
    gripper: GripperSpec
    # static config
    NV: int = static_field(default=0)
    n_bodies: int = static_field(default=0)
    body_v_start: Tuple[int, ...] = static_field(default=())
    body_v_end: Tuple[int, ...] = static_field(default=())
    body_f_start: Tuple[int, ...] = static_field(default=())
    body_f_end: Tuple[int, ...] = static_field(default=())
    dt: float = static_field(default=5e-3)
    damping: float = static_field(default=1.0)
    k_contact: float = static_field(default=10000.0)
    eps_contact: float = static_field(default=4e-4)
    eps_v: float = static_field(default=1e-2)
    max_newton_iter: int = static_field(default=50)
    newton_tol: float = static_field(default=1e-7)
    linesearch_min_alpha: float = static_field(default=1e-8)
    plastic: bool = static_field(default=False)
    grid_h: float = static_field(default=3e-3)  # broadphase candidate cutoff scale
    solver: str = static_field(default="dense")  # 'dense' | 'cg'
    spd_method: str = static_field(default="eigh")  # 'eigh' | 'shift'
    cg_tol: float = static_field(default=1e-10)
    cg_max_iter: int = static_field(default=400)
    # forward-Newton CG tolerance; None -> cg_tol. Separated from cg_tol so
    # the forward solve can run at an inexact-Newton tolerance (the line
    # search guards energy decrease and Newton's |p| termination is
    # unchanged) while the ADJOINT solves (solve_adjoint: GMRES/MINRES)
    # keep the tight tolerance that pins gradient accuracy.
    fwd_tol: float | None = static_field(default=None)
    # adjoint Krylov (GMRES/MINRES) tolerance; None -> cg_tol. The f32
    # adjoint solves hit a measured residual floor ~7e-4 (BASELINE.md), so
    # a tolerance below the floor only burns stall-detection iterations;
    # setting adj_tol near the floor exits as soon as the attainable
    # residual is reached. Gradient-accuracy impact measured by
    # scripts/grad_accuracy.py before changing any default.
    adj_tol: float | None = static_field(default=None)
    # smoothed block-Jacobi preconditioner: k extra damped-Jacobi sweeps of
    # the CHEAP operator (DIA + leftover + inertia + contact block diagonal)
    # per CG application; 0 = plain block-Jacobi
    precond_smooth: int = static_field(default=0)
    precond_omega: float = static_field(default=0.8)
    # modified Newton: rebuild the Hessian/preconditioner every k-th
    # iteration (1 = every iteration, the reference behavior); intermediate
    # iterations recompute only the residual against the stale operator.
    # Same fixed point (termination is on |p|), fewer Hessian builds.
    hess_refresh: int = static_field(default=1)
    # DIA SpMV backend: 'auto' = Pallas kernel on TPU f32, XLA elsewhere;
    # 'pallas' / 'xla' force one (ops/dia_spmv.py)
    spmv: str = static_field(default="auto")
    # bending kernel form: False = vmapped per-hinge (on-chip A/B round 4:
    # 5.11 vs 4.54 steps/s -- XLA fuses it better on TPU), True = the
    # leading-axis-split batch kernel (energies.bending_energy_batch). Part
    # of the spec hash so one program never mixes the forms (env override
    # TSL_BEND_BATCH applied once at scene build, core/builder.py).
    bend_batch: bool = static_field(default=False)
    # BCR preconditioner dense-root cutoff (gridsolve.factor_tridiag); env
    # override TSL_BCR_CUTOFF applied once at scene build.
    bcr_cutoff: int = static_field(default=4)
    dtype: Any = static_field(default=jnp.float64)


@pytree_dataclass
class Params:
    """Differentiable physical parameters."""

    kl: Any        # (n_cloths,)
    ka: Any        # (n_cloths,)
    kb: Any        # (n_cloths,)
    neo_mu: Any    # (n_neo_groups,)
    neo_lam: Any   # (n_neo_groups,)
    tact_mu: Any   # (n_tact_groups,)
    tact_lam: Any  # (n_tact_groups,)
    mu_pairs: Any  # (n_mu_slots,) friction coefficients


@pytree_dataclass
class GripperState:
    pos: Any        # (n_part, 3)
    rot: Any        # (n_part, 4) scalar-first quaternion
    dist: Any       # (n_part,) half opening distance
    pad_local: Any  # (n_pads, n_pad_verts, 3) body-frame vertex coords


@pytree_dataclass
class SimState:
    pos: Any        # (NV, 3)
    vel: Any        # (NV, 3)
    ref_angle: Any  # (NH,) plastic reference angles (hinge soup order)
    proj_flag: Any  # (C,) int32 latched projection validity per contact query
    proj_dir: Any   # (C,) int32 latched contact side
    gripper: GripperState


@pytree_dataclass
class ContactSet:
    """Constraint buffer built each step (fixed capacity C, masked)."""

    active: Any  # (C,) bool
    idx: Any     # (C, 4) int32: triangle verts (0..2) + projecting vertex (3)
    w: Any       # (C, 3) barycentric weights
    n: Any       # (C, 3) contact normal
    k: Any       # (C,) friction scale  = -mu * pressure_force
    mu: Any      # (C,)
    dx0: Any     # (C, 3) reference tangential offset
    T: Any       # (C, 2, 3) tangent frame


def zero_params(spec: SceneSpec) -> Params:
    d = spec.dtype
    nc = spec.cloth.n_cloths
    return Params(
        kl=jnp.full((max(nc, 1),), 1000.0, d),
        ka=jnp.full((max(nc, 1),), 1000.0, d),
        kb=jnp.full((max(nc, 1),), 100.0, d),
        neo_mu=jnp.zeros((1,), d),
        neo_lam=jnp.zeros((1,), d),
        tact_mu=jnp.zeros((1,), d),
        tact_lam=jnp.zeros((1,), d),
        mu_pairs=jnp.zeros((1,), d),
    )


def body_of_vertex(spec: SceneSpec, i: int) -> int:
    for b in range(spec.n_bodies):
        if spec.body_v_start[b] <= i < spec.body_v_end[b]:
            return b
    raise ValueError(i)


def np_or_jnp(x, dtype=None):
    a = np.asarray(x)
    return jnp.asarray(a, dtype=dtype)
