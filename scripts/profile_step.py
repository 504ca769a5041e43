"""Micro-profile of the hot path at bench size on the current accelerator.

Times each phase of a Newton iteration / time step separately so the
BASELINE.md roadmap can be driven by data. Usage:
    python scripts/profile_step.py [cloth_N]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from thinshelllab_tpu.engine import elements, solver, stepper
from thinshelllab_tpu.scenes import bench_scene


def timeit(name, fn, *args, reps=5):
    out = jax.block_until_ready(fn(*args))  # compile
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:>32}: {dt*1e3:9.3f} ms")
    return out


def main():
    cloth_N = int(sys.argv[1]) if len(sys.argv) > 1 else 70
    sc = bench_scene.make(cloth_N=cloth_N, dtype=jnp.float32)
    spec, params = sc.spec, sc.params
    state = sc.state0
    print(f"NV={spec.NV} faces={spec.faces.shape[0]} "
          f"hinges={spec.cloth.hinge_verts.shape[0]} "
          f"contacts cap={spec.contact.capacity} "
          f"dia offsets={len(spec.dia.offsets) if spec.dia else 0} "
          f"leftover D={spec.hvp_slots.D if spec.hvp_slots else 0}")

    action = (
        jnp.asarray([[0.0, 0.0, -4e-4]], jnp.float32),
        jnp.zeros((1, 3), jnp.float32),
        jnp.zeros((1,), jnp.float32),
    )

    # one real step to get a representative state (in contact)
    step = jax.jit(lambda s, a: stepper.time_step(spec, params, s, a))
    print("compiling full step...", flush=True)
    t0 = time.perf_counter()
    state1, _ = step(state, action)
    jax.block_until_ready(state1.pos)
    print(f"  full step compile+run: {time.perf_counter()-t0:.1f}s")
    t0 = time.perf_counter()
    state2, _ = step(state1, action)
    jax.block_until_ready(state2.pos)
    print(f"  full step (steady): {(time.perf_counter()-t0)*1e3:.1f} ms")

    pos = state1.pos
    prev_pos = pos
    contact, _, _ = jax.jit(
        lambda p, pp, f, d: stepper.build_contacts(spec, params, p, pp, f, d)
    )(pos, prev_pos, state1.proj_flag, state1.proj_dir)
    print(f"  active contacts: {int(np.sum(np.asarray(contact.active)))}")

    f_contacts = jax.jit(
        lambda p, pp, f, d: stepper.build_contacts(spec, params, p, pp, f, d)
    )
    timeit("build_contacts", f_contacts, pos, prev_pos, state1.proj_flag,
           state1.proj_dir)

    f_energy = jax.jit(lambda x: elements.total_energy(
        spec, params, x, prev_pos, state1.vel, state1.ref_angle, contact))
    timeit("total_energy", f_energy, pos)

    f_groups_nh = jax.jit(lambda x: elements.all_groups(
        spec, params, x, state1.ref_angle, contact, with_hess=False, spd=False))
    timeit("all_groups (grad only)", f_groups_nh, pos)

    f_groups = jax.jit(lambda x: elements.all_groups(
        spec, params, x, state1.ref_angle, contact, with_hess=True, spd=True))
    groups = timeit("all_groups (hess+spd)", f_groups, pos)

    f_resid = jax.jit(lambda g, x: elements.assemble_residual(
        spec, g, x, prev_pos, state1.vel))
    F = timeit("assemble_residual", f_resid, groups, pos)

    if spec.dia is not None:
        f_dia = jax.jit(lambda g: elements.assemble_dia(spec, g, jnp.float32))
        dia = timeit("assemble_dia", f_dia, groups)
        nbr = None
        if spec.hvp_slots is not None and spec.hvp_slots.D > 0:
            f_nbr = jax.jit(lambda g: elements.gather_neighbor_blocks(
                spec, g, jnp.float32))
            nbr = timeit("gather_neighbor_blocks", f_nbr, groups)
        f_hvp = jax.jit(lambda d, n, g, x: elements.hvp_dia(spec, d, n, g, x))
        timeit("hvp_dia (1 CG iter matvec)", f_hvp, dia, nbr, groups, F, reps=20)

    f_diag = jax.jit(lambda g: elements.diag_blocks(spec, g))
    timeit("diag_blocks", f_diag, groups)

    f_solve = jax.jit(lambda g, F_: solver.solve_cg(spec, g, F_))
    timeit("solve_cg (full)", f_solve, groups, F)

    # CG iteration count
    def cg_iters(g, F_):
        D = elements.diag_blocks(spec, g)
        Dinv = solver._inv3x3(D)
        precond = lambda r: jnp.einsum("nij,nj->ni", Dinv, r)
        dia = elements.assemble_dia(spec, g, F_.dtype)
        nbr = (elements.gather_neighbor_blocks(spec, g, F_.dtype)
               if spec.hvp_slots is not None and spec.hvp_slots.D > 0 else None)
        A = lambda x: elements.hvp_dia(spec, dia, nbr, g, x)
        b = F_
        tol2 = (spec.cg_tol * jnp.linalg.norm(b)) ** 2 + 1e-300
        def cond(c):
            x, r, z, p, rz, it = c
            return (jnp.sum(r * r) > tol2) & (it < spec.cg_max_iter)
        def body(c):
            x, r, z, p, rz, it = c
            Ap = A(p)
            alpha = rz / jnp.sum(p * Ap)
            x, r = x + alpha * p, r - alpha * Ap
            z = precond(r)
            rz2 = jnp.sum(r * z)
            return x, r, z, z + (rz2 / rz) * p, rz2, it + 1
        z0 = precond(b)
        *_, it = jax.lax.while_loop(
            cond, body, (jnp.zeros_like(b), b, z0, z0, jnp.sum(b * z0), 0))
        return it
    it = jax.jit(cg_iters)(groups, F)
    print(f"  CG iterations to tol: {int(it)}")

    f_newton = jax.jit(lambda: solver.newton_solve(
        spec, params, pos, prev_pos, state1.vel, state1.ref_angle, contact))
    timeit("newton_solve (full)", f_newton, reps=3)


if __name__ == "__main__":
    main()
