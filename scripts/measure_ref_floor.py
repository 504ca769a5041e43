"""Ground the reference-throughput estimate used by bench.py.

Taichi cannot be installed here, so the reference (`BaseScene.time_step`,
Taichi-CPU assembly + sparse solve, engine/sparse_solver.py:85-105) cannot
be run directly. This script measures a LOWER BOUND on its per-step cost
that favors the reference: the sparse direct solve alone (scipy spsolve,
the shim the reference needs on a CUDA-less box) on the bench scene's
exact Hessian sparsity, times the reference's Newton iteration count.
Assembly, collision, energy, and line-search costs are all ignored.

    ref steps/s  <=  1 / (n_newton * t_spsolve)

Run: python scripts/measure_ref_floor.py  (CPU, ~2-4 min)
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import scipy.sparse as sp  # noqa: E402
import scipy.sparse.linalg as spla  # noqa: E402

from thinshelllab_tpu.engine import elements, stepper  # noqa: E402
from thinshelllab_tpu.scenes import bench_scene  # noqa: E402

N = int(os.environ.get("BENCH_CLOTH_N", "70"))
scene = bench_scene.make(cloth_N=N, dtype=jnp.float64, solver='dense')
spec, params = scene.spec, scene.params

# one settling step so the contact set is the bench's steady state
acts = (jnp.full((1, scene.n_part, 3), 0.0).at[:, :, 2].add(-4e-4),
        jnp.zeros((1, scene.n_part, 3)), jnp.zeros((1, scene.n_part)))
st, _ = stepper.rollout(spec, params, scene.state0, acts)
contact, _, _ = stepper.build_contacts(spec, params, st.pos, st.pos,
                                       st.proj_flag, st.proj_dir)
groups = elements.all_groups(spec, params, st.pos, st.ref_angle, contact,
                             with_hess=True, spd=True)

# assemble the exact (3NV, 3NV) CSR the reference's solve sees
NV = spec.NV
idx = np.asarray(groups["idx"])          # (E, 4), ghost = NV
Hb = np.asarray(groups["H"])             # (E, 4, 4, 3, 3)
unf = np.concatenate([~np.asarray(spec.frozen), np.zeros((1, 3), bool)])
dof = idx[..., None] * 3 + np.arange(3)  # (E, 4, 3)
rows = np.broadcast_to(dof[:, :, None, :, None], Hb.shape).ravel()
cols = np.broadcast_to(dof[:, None, :, None, :], Hb.shape).ravel()
mask = (unf.reshape(-1)[rows] & unf.reshape(-1)[cols]
        & (rows < 3 * NV) & (cols < 3 * NV))
A = sp.coo_matrix((Hb.ravel()[mask], (rows[mask], cols[mask])),
                  shape=(3 * NV, 3 * NV)).tocsr()
A = A + sp.diags(np.repeat(np.asarray(spec.mass) / spec.dt**2, 3))
print(f"NV={NV}  DOF={3*NV}  nnz={A.nnz}  "
      f"({A.nnz/(3*NV):.1f} per row)")

rng = np.random.default_rng(0)
b = rng.normal(size=3 * NV)
ts = []
for rep in range(3):
    t0 = time.perf_counter()
    x = spla.spsolve(A.tocsc(), b)
    ts.append(time.perf_counter() - t0)
t_solve = min(ts)
resid = np.linalg.norm(A @ x - b) / np.linalg.norm(b)
print(f"spsolve: {t_solve:.3f}s (best of 3), relative residual {resid:.2e}")
for n_newton in (8, 15):
    print(f"ref steps/s floor bound @ {n_newton} Newton iters/step: "
          f"<= {1.0/(n_newton*t_solve):.3f}")
