"""Collision pipeline: broadphase candidate selection, closest point-triangle
projection, and contact-constraint construction.

TPU-native redesign of the reference's uniform-grid counting-sort broadphase
(engine/geometry.py:96-229): instead of a mutable grid we take, per contact
query (source body, target vertex), the top-K source faces by centroid
distance (static shapes, no scatter), mask them to the reference's
neighborhood radius, and run the exact point-triangle classification
(geometry.pt2tri:23-87) on the K candidates.

The projection side (`proj_dir`) is latched at first contact exactly like the
reference (geometry.project_pair:210-219), and constraints are built per
(source body, target vertex) slot following BaseScene.contact_pair_analysis
(:778-816): one constraint slot per query, masked by gap < eps_contact.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.spec import ContactSet, SceneSpec

# 3x3x3 neighborhood offsets for the spatial-hash broadphase
_OFF27 = np.array(
    [(i, j, k) for i in (-1, 0, 1) for j in (-1, 0, 1) for k in (-1, 0, 1)],
    np.int32,
)


def _hash_grid(cent, cutoff, G):
    """Counting-sort the source centroids into a static (Gx,Gy,Gz) grid of
    cell size `cutoff` (TPU-shaped analogue of the reference's uniform-grid
    broadphase, engine/geometry.py:96-163). Returns (origin, sorted cell
    ids, face permutation). All shapes static; the origin is dynamic and
    cell coords clamp into the grid (clamping merges out-of-range content
    into boundary cells -- a candidate superset, never a miss)."""
    Gx, Gy, Gz = G
    Ga = jnp.array([Gx, Gy, Gz], jnp.int32)
    origin = jnp.min(cent, axis=0)
    cell = jnp.clip(
        jnp.floor((cent - origin) / cutoff).astype(jnp.int32), 0, Ga - 1
    )
    cid = (cell[:, 0] * Gy + cell[:, 1]) * Gz + cell[:, 2]
    sc, perm = jax.lax.sort_key_val(
        cid, jnp.arange(cent.shape[0], dtype=jnp.int32)
    )
    return origin, sc, perm


def _hash_candidates(origin, sc, perm, q, cutoff, G, cap):
    """Per query: gather <= cap faces from each of the 27 neighbor cells of
    the query's cell. Any face whose centroid lies within L-inf `cutoff` of
    q is guaranteed among the candidates (cell size == cutoff), provided no
    cell holds more than cap faces. Returns (cand (c, 27*cap) local face
    ids, ok (c, 27*cap))."""
    nf = sc.shape[0]
    Gx, Gy, Gz = G
    Ga = jnp.array([Gx, Gy, Gz], jnp.int32)
    qcell = jnp.clip(
        jnp.floor((q - origin) / cutoff).astype(jnp.int32), 0, Ga - 1
    )
    neigh = jnp.clip(qcell[:, None, :] + jnp.asarray(_OFF27)[None], 0, Ga - 1)
    ncid = (neigh[..., 0] * Gy + neigh[..., 1]) * Gz + neigh[..., 2]  # (c,27)
    # boundary clamping can collapse distinct neighbor offsets onto the same
    # cell; mask the repeats so duplicates never crowd out real candidates
    eq = ncid[:, :, None] == ncid[:, None, :]
    is_dup = jnp.any(eq & np.tril(np.ones((27, 27), bool), -1)[None], axis=2)
    start = jnp.searchsorted(sc, ncid)  # (c, 27)
    idxs = start[..., None] + jnp.arange(cap, dtype=jnp.int32)  # (c, 27, cap)
    inb = idxs < nf
    idxs = jnp.minimum(idxs, nf - 1)
    ok = inb & (sc[idxs] == ncid[..., None]) & ~is_dup[..., None]
    cand = perm[idxs]
    return cand.reshape(q.shape[0], -1), ok.reshape(q.shape[0], -1)


def pt2tri(x, p1, p2, p3):
    """Closest-point classification of x against triangle (p1,p2,p3).

    Returns (case, d, w): case 0 interior, 1/2/3 vertex, -3/-1/-2 edges
    (12/23/31), distance d, barycentric weights w. Vectorizable; mirrors
    reference geometry.pt2tri semantics."""
    e1 = (p2 - p1) / jnp.linalg.norm(p2 - p1)
    e2 = (p3 - p2) / jnp.linalg.norm(p3 - p2)
    e3 = (p1 - p3) / jnp.linalg.norm(p1 - p3)
    n = -jnp.cross(e1, e3)
    n = n / jnp.linalg.norm(n)
    x1 = x - jnp.dot(x - p1, n) * n

    out12 = jnp.dot(jnp.cross(x1 - p1, e1), n) > 0
    out23 = jnp.dot(jnp.cross(x1 - p2, e2), n) > 0
    out31 = jnp.dot(jnp.cross(x1 - p3, e3), n) > 0

    dt_ = x.dtype
    e100 = jnp.array([1.0, 0.0, 0.0], dt_)
    e010 = jnp.array([0.0, 1.0, 0.0], dt_)
    e001 = jnp.array([0.0, 0.0, 1.0], dt_)
    d_p1 = jnp.linalg.norm(x - p1)
    d_p2 = jnp.linalg.norm(x - p2)
    d_p3 = jnp.linalg.norm(x - p3)

    def edge_proj(a, b, ea):
        alpha = jnp.dot(x1 - a, ea) / jnp.dot(b - a, ea)
        xp = a + alpha * (b - a)
        return alpha, jnp.linalg.norm(x - xp)

    a12, d_e12 = edge_proj(p1, p2, e1)
    a23, d_e23 = edge_proj(p2, p3, e2)
    a31, d_e31 = edge_proj(p3, p1, e3)

    # interior barycentrics
    S = jnp.linalg.norm(jnp.cross(p3 - p1, p2 - p1))
    w1 = jnp.dot(jnp.cross(p3 - p2, x1 - p2), n) / S
    w2 = jnp.dot(jnp.cross(p1 - p3, x1 - p3), n) / S
    w3 = jnp.dot(jnp.cross(p2 - p1, x1 - p1), n) / S
    d_int = jnp.linalg.norm(x - x1)

    # region 12: vertex p1 / vertex p2 / edge 12
    in12_p1 = jnp.dot(x1 - p1, e1) < 0
    in12_p2 = jnp.dot(x1 - p2, e1) > 0
    c12 = jnp.where(in12_p1, 1, jnp.where(in12_p2, 2, -3))
    d12 = jnp.where(in12_p1, d_p1, jnp.where(in12_p2, d_p2, d_e12))
    w12 = jnp.where(
        in12_p1,
        e100,
        jnp.where(
            in12_p2, e010, jnp.stack([1 - a12, a12, 0.0 * a12])
        ),
    )
    # region 23
    in23_p2 = jnp.dot(x1 - p2, e2) < 0
    in23_p3 = jnp.dot(x1 - p3, e2) > 0
    c23 = jnp.where(in23_p2, 2, jnp.where(in23_p3, 3, -1))
    d23 = jnp.where(in23_p2, d_p2, jnp.where(in23_p3, d_p3, d_e23))
    w23 = jnp.where(
        in23_p2,
        e010,
        jnp.where(
            in23_p3, e001, jnp.stack([0.0 * a23, 1 - a23, a23])
        ),
    )
    # region 31
    in31_p3 = jnp.dot(x1 - p3, e3) < 0
    in31_p1 = jnp.dot(x1 - p1, e3) > 0
    c31 = jnp.where(in31_p3, 3, jnp.where(in31_p1, 1, -2))
    d31 = jnp.where(in31_p3, d_p3, jnp.where(in31_p1, d_p1, d_e31))
    w31 = jnp.where(
        in31_p3,
        e001,
        jnp.where(
            in31_p1, e100, jnp.stack([a31, 0.0 * a31, 1 - a31])
        ),
    )

    case = jnp.where(out12, c12, jnp.where(out23, c23, jnp.where(out31, c31, 0)))
    d = jnp.where(out12, d12, jnp.where(out23, d23, jnp.where(out31, d31, d_int)))
    w_int = jnp.stack([w1, w2, w3])
    w = jnp.where(out12, w12, jnp.where(out23, w23, jnp.where(out31, w31, w_int)))
    return case, d, w


def vertex_normals(pos, faces, NV):
    """Area-weighted vertex normals (reference BaseScene.calc_vn:837-850)."""
    v1 = pos[faces[:, 0]]
    n = jnp.cross(pos[faces[:, 1]] - v1, pos[faces[:, 2]] - v1)
    vn = jnp.zeros((NV, 3), pos.dtype)
    for k in range(3):
        vn = vn.at[faces[:, k]].add(n)
    norm = jnp.linalg.norm(vn, axis=1, keepdims=True)
    return vn / jnp.maximum(norm, jnp.finfo(pos.dtype).tiny)


def projection_query(spec: SceneSpec, pos, vn, proj_flag, proj_dir):
    """For each contact query slot, find the closest source-body face and
    update latched (proj_flag, proj_dir, proj_idx, proj_w).

    Swept per contact pair with static shapes: each pair's target vertices
    compute an L-inf centroid distance matrix against ONLY that pair's
    source faces (chunked to bound transients), take the top-K nearest, and
    run the exact point-triangle classification on the K candidates.

    Returns (proj_flag, proj_dir, proj_idx (C,3), proj_w (C,3))."""
    con = spec.contact
    # spec leaves are numpy; promote faces since it is gathered with traced
    # indices below
    faces = jnp.asarray(spec.faces)
    centroids = (pos[faces[:, 0]] + pos[faces[:, 1]] + pos[faces[:, 2]]) / 3.0
    cutoff = 2.0 * spec.grid_h
    max_elems = 32 * 1024 * 1024  # bound the (chunk, nf) distance matrix

    def detail(vid, cand_f, cand_ok, is_self):
        """Exact evaluation of K candidates for a batch of queries.
        vid: (c,), cand_f: (c, K), cand_ok: (c, K)."""
        x = pos[vid]  # (c, 3)
        tri = faces[cand_f]  # (c, K, 3)
        if is_self:
            incident = jnp.any(tri == vid[:, None, None], axis=2)
            cand_ok = cand_ok & ~incident
        p1, p2, p3 = pos[tri[..., 0]], pos[tri[..., 1]], pos[tri[..., 2]]
        case, d, w = jax.vmap(jax.vmap(pt2tri, in_axes=(None, 0, 0, 0)))(
            x, p1, p2, p3
        )
        vt = w[..., 0:1] * p1 + w[..., 1:2] * p2 + w[..., 2:3] * p3
        nt = jnp.cross(p2 - p1, p3 - p1)
        nt = nt / jnp.maximum(jnp.linalg.norm(nt, axis=-1, keepdims=True),
                              jnp.finfo(pos.dtype).tiny)
        cos = jnp.sum((x[:, None] - vt) * nt, axis=-1)
        d = jnp.where(cand_ok, d, jnp.inf)
        d_min = jnp.min(d, axis=1, keepdims=True)
        near = d < d_min + 1e-5
        score = jnp.where(near, cos, -jnp.inf)
        best = jnp.argmax(score, axis=1)
        rows = jnp.arange(vid.shape[0])
        found = jnp.isfinite(d_min[:, 0])
        if is_self:
            # self-contact accepts only face-interior projections
            # (geometry_self.project_pair_self:166-230)
            found = found & (case[rows, best] == 0)
        return found, tri[rows, best], w[rows, best]

    C = con.capacity
    found = jnp.zeros((C,), bool)
    # default to a real (non-degenerate) triangle so inactive slots never
    # produce NaNs through the masked barrier/friction evaluations
    tri_out = jnp.broadcast_to(faces[-1], (C, 3)).astype(jnp.int32)
    w_out = jnp.broadcast_to(
        jnp.array([1.0, 0.0, 0.0], pos.dtype), (C, 3)
    )

    for pi, (cq_start, count, f_start, nf, is_self) in enumerate(
        spec.contact.pair_desc
    ):
        vids_np = con.cq_vert[cq_start : cq_start + count]
        K = min(con.top_k, nf)
        cent = centroids[f_start : f_start + nf]  # (nf, 3) static slice
        hd = con.hash_desc[pi] if pi < len(con.hash_desc) else None
        if nf < con.hash_min_faces:
            hd = None  # dense sweep measured faster below the crossover
        if hd is not None:
            grid = _hash_grid(cent, cutoff, hd[:3])  # built once per pair
        chunk = max(1, min(count, max(1, max_elems // max(nf, 1))))
        n_chunks = -(-count // chunk)
        pf_list, pt_list, pw_list = [], [], []
        for ci in range(n_chunks):
            lo = ci * chunk
            hi = min(count, lo + chunk)
            vid = jnp.asarray(vids_np[lo:hi])
            q = pos[vid]  # (c, 3)
            if hd is not None:
                # spatial-hash prefilter: L-inf + top-K over <= 27*cap
                # candidates instead of all nf faces. Kh = 2K: the dense
                # path's K-by-centroid-distance truncation already loses the
                # true nearest face when > K candidates sit inside the
                # cutoff; the prefilter makes a deeper exact stage cheap, so
                # take twice the budget (exact selection whenever the
                # in-cutoff population is <= 2K -- checked against an
                # exhaustive oracle in tests/test_collision.py)
                cand, okh = _hash_candidates(*grid, q, cutoff, hd[:3], hd[3])
                linf = jnp.max(jnp.abs(cent[cand] - q[:, None, :]), axis=-1)
                linf = jnp.where(okh, linf, jnp.inf)
                Kh = min(2 * K, cand.shape[1])
                neg, sel = jax.lax.top_k(-linf, Kh)
                cand_f = f_start + jnp.take_along_axis(cand, sel, axis=1)
                cand_ok = -neg < cutoff
            else:
                linf = jnp.abs(cent[None, :, 0] - q[:, None, 0])
                for dim in (1, 2):
                    linf = jnp.maximum(
                        linf, jnp.abs(cent[None, :, dim] - q[:, None, dim])
                    )
                _, top_idx = jax.lax.top_k(-linf, K)
                cand_f = f_start + top_idx
                cand_ok = (
                    jnp.take_along_axis(linf, top_idx, axis=1) < cutoff
                )
            f, t, w = detail(vid, cand_f, cand_ok, is_self)
            pf_list.append(f)
            pt_list.append(t)
            pw_list.append(w)
        found = found.at[cq_start : cq_start + count].set(
            jnp.concatenate(pf_list)
        )
        tri_out = tri_out.at[cq_start : cq_start + count].set(
            jnp.concatenate(pt_list)
        )
        w_out = w_out.at[cq_start : cq_start + count].set(
            jnp.concatenate(pw_list)
        )

    tri = tri_out
    w = w_out

    # latched side: set dir at the 0 -> 1 transition of proj_flag
    v = jnp.einsum("ck,ck...->c...", w, pos[tri])
    n = jnp.einsum("ck,ck...->c...", w, vn[tri])
    xq = pos[jnp.asarray(con.cq_vert)]
    new_dir = (jnp.sum((xq - v) * n, axis=1) > 0).astype(jnp.int32)
    first = (proj_flag == 0) & found
    proj_dir = jnp.where(first, new_dir, proj_dir)
    proj_flag = found.astype(jnp.int32)
    return proj_flag, proj_dir, tri, w


def contact_analysis(
    spec: SceneSpec, params_mu_pairs, pos, prev_pos, proj_flag, proj_dir, tri, w
):
    """Build the fixed-capacity constraint set (reference
    BaseScene.contact_pair_analysis:778-816)."""
    con = spec.contact
    mu = params_mu_pairs[con.cq_mu_id]
    vid = con.cq_vert

    # orient: if latched dir == 0, flip normal by swapping triangle verts 1,2
    flip = proj_dir == 0
    i1 = jnp.where(flip, tri[:, 2], tri[:, 1])
    i2 = jnp.where(flip, tri[:, 1], tri[:, 2])
    i0 = tri[:, 0]
    w1 = jnp.where(flip, w[:, 2], w[:, 1])
    w2 = jnp.where(flip, w[:, 1], w[:, 2])
    w0 = w[:, 0]
    wv = jnp.stack([w0, w1, w2], axis=1)
    idx = jnp.stack([i0, i1, i2, vid], axis=1)

    n_c = jnp.cross(pos[i1] - pos[i0], pos[i2] - pos[i0])
    # dtype-aware guard: a literal like 1e-300 is ZERO in f32, and a
    # degenerate (masked-slot) face then yields 0/0 = NaN normals that no
    # downstream active-mask multiply can remove (NaN * 0 = NaN)
    n_c = n_c / jnp.maximum(jnp.linalg.norm(n_c, axis=1, keepdims=True),
                            jnp.finfo(pos.dtype).tiny)

    x_c = jnp.einsum("ck,ck...->c...", wv, pos[idx[:, :3]])
    x0_c = jnp.einsum("ck,ck...->c...", wv, prev_pos[idx[:, :3]])
    gap = jnp.sum((pos[vid] - x_c) * n_c, axis=1)
    active = (proj_flag == 1) & (gap < spec.eps_contact)

    pressure_force = spec.k_contact * (gap - spec.eps_contact)
    k = -mu * pressure_force
    dx0 = prev_pos[vid] - x0_c

    # tangent frame (reference :804-811; deliberately not orthonormalized)
    small = jnp.abs(n_c[:, 0]) < 0.5
    t1 = jnp.where(
        small[:, None],
        jnp.stack([n_c[:, 0], n_c[:, 2], -n_c[:, 1]], axis=1),
        jnp.stack([n_c[:, 1], -n_c[:, 0], n_c[:, 2]], axis=1),
    )
    t2 = jnp.cross(n_c, t1)
    t1 = jnp.cross(n_c, t2)
    T = jnp.stack([t1, t2], axis=1)  # (C, 2, 3)

    return ContactSet(active=active, idx=idx, w=wv, n=n_c, k=k, mu=mu, dx0=dx0, T=T)
