"""A/B the adjoint GMRES preconditioner: plain BCR apply vs k residual-
correction sweeps (M_k(r): z += M(r - A z)) around it. GMRES needs no SPD/
symmetry from M, so iterating the preconditioner against the FULL operator
is legal; each sweep costs one extra A-apply + M-apply per GMRES iteration
but (if it cuts the count) also shrinks the O(k^2) orthogonalization work,
which matters on a dispatch-bound TPU step. Iteration counts are hardware-
independent -- CPU runs of this script predict the TPU ordering.

Usage: python scripts/probe_gmres_precond.py [cloth_N] [T] [--cpu]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
    sys.argv.remove("--cpu")

import jax.numpy as jnp
import numpy as np


def main():
    cloth_N = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from thinshelllab_tpu.engine import elements, gridsolve, solver, stepper
    from thinshelllab_tpu.scenes import bench_scene

    sc = bench_scene.make(cloth_N=cloth_N, dtype=jnp.float32)
    spec, params = sc.spec, sc.params

    dpos = np.zeros((T, 1, 3))
    dpos[:, 0, 2] = -4e-4
    acts = (jnp.asarray(dpos, jnp.float32),
            jnp.zeros((T, 1, 3), jnp.float32),
            jnp.zeros((T, 1), jnp.float32))

    @jax.jit
    def roll(a):
        st, _ = stepper.rollout(spec, params,
                                jax.tree.map(jnp.asarray, sc.state0), a)
        return st

    st = roll(acts)
    contact, _, _ = stepper.build_contacts(spec, params, st.pos, st.pos,
                                           st.proj_flag, st.proj_dir)
    groups = elements.all_groups(spec, params, st.pos, st.ref_angle,
                                 contact, with_hess=True, spd=False)
    rng = np.random.default_rng(0)
    g = jnp.asarray(rng.normal(0, 1, (spec.NV, 3)), jnp.float32)
    g = jnp.where(jnp.asarray(spec.frozen), 0.0, g)

    # rebuild solve_gmres's exact preconditioner state once
    stt = solver.prepare_solver_state(spec, groups, g.dtype)
    A, _ = solver._ops_from_state(spec, stt)
    D = stt["D"]
    lam, Q = jnp.linalg.eigh(D)
    mx = jnp.max(jnp.abs(lam), axis=-1, keepdims=True)
    lam = jnp.maximum(jnp.abs(lam), 1e-6 * mx + 1e-30)
    Dinv = jnp.einsum("nik,nk,njk->nij", Q, 1.0 / lam, Q)
    grid_plan = gridsolve.build_grid_plan(spec)
    ns = elements.static_block_count(spec)
    slot_lists = gridsolve.contact_coupling_slots(spec, grid_plan)
    dia_pc = gridsolve.add_contact_couplings(
        spec, grid_plan, slot_lists, stt["dia"],
        groups["idx"][ns:], groups["H"][ns:])
    pre = gridsolve.GridPreconditioner(spec, grid_plan, dia_pc, Dinv,
                                       stt.get("Dc"))

    def M_sweeps(k):
        def M(r):
            z = pre.apply(r)
            for _ in range(k):
                z = z + pre.apply(r - A(z))
            return z
        return M

    restart = min(spec.cg_max_iter, 64)
    for k in (0, 1, 2):
        run = jax.jit(lambda b, k=k: solver._gmres_loop(
            A, M_sweeps(k), b, spec.cg_tol, restart, spec.cg_max_iter,
            return_iters=True))
        z, it = run(g)
        jax.block_until_ready(z)
        t0 = time.time()
        z, it = run(g)
        jax.block_until_ready(z)
        dt = time.time() - t0
        r = g - A(z)
        rel = float(jnp.linalg.norm(r) / jnp.linalg.norm(g))
        # effective cost unit: A-applies (1 + k per iteration)
        print(f"sweeps={k}: iters={int(it)}  A-applies~{int(it)*(1+k)}  "
              f"rel_resid={rel:.3e}  t={dt:.3f}s")


if __name__ == "__main__":
    main()
