"""Compile-time probe (VERDICT r3 item 6): lower + compile the bench
fwd+bwd program at small N on CPU, time the phases, and histogram the
optimized HLO's computations to find pass-cloning blowups (the round-3
attack found lax.cond bodies cloned as 'wide.wide....sunk.clone'
computations inside the scan>while nest; this script is how the next
sink gets found).

Usage: python scripts/probe_compile.py [cloth_N] [hess_refresh]
Env: PROBE_PART={fwd,bwd,both} (default both) -- compile only one half to
attribute compile cost between the forward scan and the adjoint scan.
"""
import collections
import os
import re
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def main():
    cloth_N = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    refresh = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    part = os.environ.get("PROBE_PART", "both")

    from thinshelllab_tpu.engine import adjoint, stepper
    from thinshelllab_tpu.scenes import bench_scene

    sc = bench_scene.make(cloth_N=cloth_N, dtype=jnp.float32,
                          hess_refresh=refresh, fwd_tol=1e-3)
    spec, params = sc.spec, sc.params
    T = 1
    dpos = np.zeros((T, 1, 3), dtype=np.float64)
    dpos[:, 0, 2] = -0.0004
    actions = (jnp.asarray(dpos, jnp.float32),
               jnp.zeros((T, 1, 3), jnp.float32),
               jnp.zeros((T, 1), jnp.float32))

    def fwd_only(acts):
        _final, buffers = stepper.simulate(spec, params, sc.state0, acts)
        return buffers["pos"][-1]

    def fwd_bwd(acts):
        final, buffers = stepper.simulate(spec, params, sc.state0, acts)
        seed_pos, seed_ar = sc.seed_loss(buffers)
        res = adjoint.backward(spec, params, buffers, seed_pos, seed_ar)
        return res.gripper_grad, buffers["pos"][-1]

    def bwd_only(buffers):
        seed_pos, seed_ar = sc.seed_loss(buffers)
        res = adjoint.backward(spec, params, buffers, seed_pos, seed_ar)
        return res.gripper_grad

    if part == "fwd":
        fn, args = fwd_only, (actions,)
    elif part == "bwd":
        _, buffers = jax.jit(
            lambda a: stepper.simulate(spec, params, sc.state0, a))(actions)
        fn, args = bwd_only, (buffers,)
    else:
        fn, args = fwd_bwd, (actions,)

    t0 = time.time()
    lowered = jax.jit(fn).lower(*args)
    t_lower = time.time() - t0
    shlo = lowered.as_text()
    t0 = time.time()
    compiled = lowered.compile()
    t_compile = time.time() - t0
    print(f"part={part} N={cloth_N} refresh={refresh}: "
          f"lower {t_lower:.1f}s ({len(shlo.splitlines())} stablehlo lines), "
          f"compile {t_compile:.1f}s")

    hlo = compiled.as_text()
    lines = hlo.splitlines()
    print(f"optimized HLO: {len(lines)} lines")

    # histogram computations by normalized name (strip clone/digit suffixes)
    comp_sizes = {}
    cur, n = None, 0
    for ln in lines:
        m = re.match(r"%?([\w\.\-]+)\s.*\{$", ln.strip())
        if ln.strip().startswith(("ENTRY", "%")) and ln.rstrip().endswith("{"):
            if cur is not None:
                comp_sizes[cur] = n
            nm = ln.strip().split()[0].lstrip("%")
            cur, n = nm, 0
        else:
            n += 1
    if cur is not None:
        comp_sizes[cur] = n

    def norm(name):
        name = re.sub(r"[\d\.]+$", "", name)
        name = re.sub(r"(clone|sunk|wide)", r"\1", name)
        return name

    agg = collections.Counter()
    cnt = collections.Counter()
    for nm, sz in comp_sizes.items():
        agg[norm(nm)] += sz
        cnt[norm(nm)] += 1
    print(f"{len(comp_sizes)} computations; top by total lines:")
    for nm, sz in agg.most_common(20):
        print(f"  {sz:7d} lines  x{cnt[nm]:3d}  {nm[:90]}")


if __name__ == "__main__":
    main()
