"""A/B: spatial-hash broadphase vs dense L-inf sweep, full projection_query
wall time on the real device at bench size. Also times the two candidate
budgets (Kh = 2K vs K) to separate prefilter cost from exact-stage cost.

Usage: python scripts/ab_broadphase.py [cloth_N] [reps]
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from thinshelllab_tpu.ops import collision
from thinshelllab_tpu.scenes import bench_scene


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 70
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    sc = bench_scene.make(cloth_N=N, dtype=jnp.float32, solver="cg")
    spec = sc.spec
    con = spec.contact
    print(f"N={N} pairs={len(con.pair_desc)} hash={con.hash_desc} "
          f"top_k={con.top_k}")

    # force the hash ON regardless of the production crossover threshold
    spec = dataclasses.replace(
        spec, contact=dataclasses.replace(con, hash_min_faces=0))
    spec_dense = dataclasses.replace(
        spec, contact=dataclasses.replace(
            con, hash_desc=(None,) * len(con.hash_desc)))

    pos = jnp.asarray(sc.state0.pos, jnp.float32)
    vn = collision.vertex_normals(pos, spec.faces, spec.NV)
    C = con.capacity
    pf0 = jnp.zeros((C,), jnp.int32)
    pd0 = jnp.zeros((C,), jnp.int32)

    for name, sp in (("hash", spec), ("dense", spec_dense)):
        fn = jax.jit(lambda p, v, f, d, sp=sp: collision.projection_query(
            sp, p, v, f, d))
        out = fn(pos, vn, pf0, pd0)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(pos, vn, pf0, pd0)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        print(f"{name:6s} {dt * 1e3:8.2f} ms/query")


if __name__ == "__main__":
    main()
