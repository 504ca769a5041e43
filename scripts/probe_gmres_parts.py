"""Component timings for the adjoint GMRES solve at bench size: operator
applies, preconditioner build (eigh + contact couplings + BCR
factorization), preconditioner apply, and capped GMRES cycles. Diagnoses
where a solve-level regression lives.

Usage: python scripts/probe_gmres_parts.py [cloth_N]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timed(name, fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:28s} {dt * 1e3:10.3f} ms", flush=True)
    return out


def main():
    cloth_N = int(sys.argv[1]) if len(sys.argv) > 1 else 70

    from thinshelllab_tpu.engine import elements, gridsolve, solver, stepper
    from thinshelllab_tpu.scenes import bench_scene

    sc = bench_scene.make(cloth_N=cloth_N, dtype=jnp.float32)
    spec, params = sc.spec, sc.params

    T = 4
    dpos = np.zeros((T, 1, 3))
    dpos[:, 0, 2] = -4e-4
    acts = (jnp.asarray(dpos, jnp.float32), jnp.zeros((T, 1, 3), jnp.float32),
            jnp.zeros((T, 1), jnp.float32))

    @jax.jit
    def roll(a):
        st, _ = stepper.rollout(spec, params,
                                jax.tree.map(jnp.asarray, sc.state0), a)
        return st

    st = roll(acts)
    contact, _, _ = stepper.build_contacts(spec, params, st.pos, st.pos,
                                           st.proj_flag, st.proj_dir)

    groups = jax.jit(
        lambda p, r: elements.all_groups(spec, params, p, r, contact,
                                         with_hess=True, spd=False)
    )(st.pos, st.ref_angle)
    jax.block_until_ready(groups)

    rng = np.random.default_rng(0)
    g = jnp.asarray(rng.normal(0, 1, (spec.NV, 3)), jnp.float32)
    g = jnp.where(jnp.asarray(spec.frozen), 0.0, g)

    prep = jax.jit(
        lambda G: solver.prepare_solver_state(spec, G, jnp.float32))
    stt = timed("prepare_solver_state", prep, groups, reps=5)

    dia, nbr = stt["dia"], stt.get("nbr")

    hvp_s = jax.jit(
        lambda d, n, x: elements.hvp_dia_static(spec, d, n, x))
    timed("hvp_dia_static", hvp_s, dia, nbr, g)

    hvp_f = jax.jit(
        lambda d, n, G, x: elements.hvp_dia(spec, d, n, G, x))
    timed("hvp_dia (full)", hvp_f, dia, nbr, groups, g)

    gp = gridsolve.build_grid_plan(spec)
    sl = gridsolve.contact_coupling_slots(spec, gp)
    ns = elements.static_block_count(spec)

    @jax.jit
    def build_pre_arrays(G, d):
        D = elements.diag_blocks_dia(spec, G, d, None)
        lam, Q = jnp.linalg.eigh(D)
        mx = jnp.max(jnp.abs(lam), axis=-1, keepdims=True)
        lam = jnp.maximum(jnp.abs(lam), 1e-6 * mx + 1e-30)
        Dinv = jnp.einsum("nik,nk,njk->nij", Q, 1.0 / lam, Q)
        dia_pc = gridsolve.add_contact_couplings(
            spec, gp, sl, d, G["idx"][ns:], G["H"][ns:])
        facs = [gridsolve.factor_tridiag(
            *gridsolve.extract_cloth_tridiag(spec, e, dia_pc, None))
            for e in gp]
        return Dinv, dia_pc, facs

    Dinv, dia_pc, _ = timed("precond build (eigh+BCR)", build_pre_arrays,
                            groups, dia, reps=5)
    pre = gridsolve.GridPreconditioner(spec, gp, dia_pc, Dinv, None)
    m_apply = jax.jit(lambda r: pre.apply(r))
    timed("precond apply", m_apply, g)

    for m in (8, 32, 64):
        def one_cycle(G, b, m=m):
            stt = solver.prepare_solver_state(spec, G, b.dtype)
            A, _ = solver._ops_from_state(spec, stt)
            D = stt["D"]
            lam, Q = jnp.linalg.eigh(D)
            mx = jnp.max(jnp.abs(lam), axis=-1, keepdims=True)
            lam = jnp.maximum(jnp.abs(lam), 1e-6 * mx + 1e-30)
            Dinv = jnp.einsum("nik,nk,njk->nij", Q, 1.0 / lam, Q)
            gp = gridsolve.build_grid_plan(spec)
            ns = elements.static_block_count(spec)
            sl = gridsolve.contact_coupling_slots(spec, gp)
            dia_pc = gridsolve.add_contact_couplings(
                spec, gp, sl, stt["dia"], G["idx"][ns:], G["H"][ns:])
            pre = gridsolve.GridPreconditioner(spec, gp, dia_pc, Dinv, None)
            return solver._gmres_loop(A, pre.apply, b, spec.cg_tol, m, m)

        timed(f"gmres cycle m={m:3d}", jax.jit(one_cycle), groups, g,
              reps=3)


if __name__ == "__main__":
    main()
