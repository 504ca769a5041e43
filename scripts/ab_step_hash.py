"""A/B the FULL forward time_step with the spatial-hash broadphase on vs
off (dense L-inf sweep), on a settled (deformed, in-contact) state; also
reports the active-contact occupancy of the contact capacity -- the
compaction headroom for the per-CG-iteration contact matvec gathers.

Usage: python scripts/ab_step_hash.py [cloth_N] [settle_T] [reps]
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from thinshelllab_tpu.engine import stepper
from thinshelllab_tpu.scenes import bench_scene


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 70
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    sc = bench_scene.make(cloth_N=N, dtype=jnp.float32, hess_refresh=2)
    spec = sc.spec
    con = spec.contact
    # force the hash ON regardless of the production crossover threshold
    spec = dataclasses.replace(
        spec, contact=dataclasses.replace(con, hash_min_faces=0))
    spec_dense = dataclasses.replace(
        spec, contact=dataclasses.replace(
            con, hash_desc=(None,) * len(con.hash_desc)))

    action = (jnp.asarray([[0.0, 0.0, -4e-4]], jnp.float32),
              jnp.zeros((1, 3), jnp.float32), jnp.zeros((1,), jnp.float32))
    acts = jax.tree.map(lambda a: jnp.broadcast_to(a[None], (T,) + a.shape),
                        action)

    @jax.jit
    def settle(a):
        st, _ = stepper.rollout(spec, sc.params,
                                jax.tree.map(jnp.asarray, sc.state0), a)
        return st

    st = settle(acts)
    jax.block_until_ready(st.pos)
    n_act = int(np.asarray(st.proj_flag).sum())
    print(f"N={N} capacity={con.capacity} active_contacts={n_act} "
          f"({100.0 * n_act / con.capacity:.1f}%)")

    for name, sp in (("hash", spec), ("dense", spec_dense)):
        step = jax.jit(lambda s, a, sp=sp: stepper.time_step(
            sp, sc.params, s, a)[0])
        t0 = time.time()
        out = step(st, action)
        jax.block_until_ready(out.pos)
        c = time.time() - t0
        t0 = time.perf_counter()
        for _ in range(reps):
            out = step(st, action)
        jax.block_until_ready(out.pos)
        dt = (time.perf_counter() - t0) / reps
        print(f"{name:6s} compile {c:6.1f}s  step {dt * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
