"""Bisect the on-chip folding-simulate TPU worker crash by scan length.

The folding FORWARD (stepper.simulate) reproducibly crashes this image's
TPU worker ("kernel fault") inside the trajopt driver at T=50 while the
folding BACKWARD runs fine on oracle tapes (scripts/grad_accuracy.py) and
the 40k-tri triage showed the opposite split on the bench scene (forward
fine, backward crashes). This runs ONLY the forward at a given T so the
crash can be bisected; each invocation is one TPU process.

Usage: python scripts/triage_folding.py [T] [cap]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if os.environ.get("TRIAGE_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["TRIAGE_PLATFORM"])

import jax.numpy as jnp
import numpy as np


def main():
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    cap = int(sys.argv[2]) if len(sys.argv) > 2 else 0

    from thinshelllab_tpu.engine import stepper
    from thinshelllab_tpu.scenes import registry

    kwargs = dict(dtype=jnp.float32, solver="auto")
    if cap:
        kwargs["max_newton_iter"] = cap
    scene = registry.make_scene("folding", **kwargs)
    spec, params = scene.spec, scene.params
    print(f"T={T} NV={spec.NV} solver={spec.solver} cap={spec.max_newton_iter}",
          flush=True)

    rng = np.random.default_rng(0)
    acts = (jnp.asarray(2e-4 * rng.normal(size=(T, scene.n_part, 3)),
                        jnp.float32),
            jnp.zeros((T, scene.n_part, 3), jnp.float32),
            jnp.zeros((T, scene.n_part), jnp.float32))

    run = jax.jit(lambda a: stepper.simulate(
        spec, params, jax.tree.map(jnp.asarray, scene.state0), a))
    t0 = time.time()
    final, buffers = run(acts)
    p = jax.device_get(buffers["pos"][-1])
    print(f"OK T={T}: wall {time.time()-t0:.1f}s "
          f"finite={bool(np.isfinite(p).all())}", flush=True)


if __name__ == "__main__":
    main()
