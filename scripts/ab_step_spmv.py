"""A/B the FULL forward time_step with the XLA padded-slices DIA SpMV vs
the Pallas streaming kernel. The microbenchmark (ab_dia_spmv.py) showed
XLA ~15 us vs Pallas ~21 us per isolated apply, but the XLA formulation
issues ~70 dynamic-slice HLOs per apply while the kernel is ONE op -- and
bench.py's cost-model fields show the step is dispatch-latency bound
(hbm_util 8%, mfu 0.04%), so op count, not bytes, is the currency.

Usage: python scripts/ab_step_spmv.py [cloth_N] [settle_T] [reps]
"""
import dataclasses
import sys
import time

import os
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

    for name in ("xla", "pallas"):
        sp = dataclasses.replace(spec, spmv=name)
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
