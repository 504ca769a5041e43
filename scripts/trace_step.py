"""Capture a device trace of the steady-state full step (or fwd+bwd bench
iteration) and print the top HLO ops by self time.

Usage: python scripts/trace_step.py [cloth_N] [fwd|fwdbwd]
"""
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    cloth_N = int(sys.argv[1]) if len(sys.argv) > 1 else 70
    mode = sys.argv[2] if len(sys.argv) > 2 else "fwd"

    from thinshelllab_tpu.engine import adjoint, stepper
    from thinshelllab_tpu.scenes import bench_scene

    refresh = int(os.environ.get("BENCH_HESS_REFRESH", "4"))
    fwd_tol = float(os.environ.get("BENCH_CG_TOL", "1e-3"))
    sc = bench_scene.make(cloth_N=cloth_N, dtype=jnp.float32,
                          hess_refresh=refresh, fwd_tol=fwd_tol)
    spec, params = sc.spec, sc.params

    if mode == "fwd":
        action = (jnp.asarray([[0.0, 0.0, -4e-4]], jnp.float32),
                  jnp.zeros((1, 3), jnp.float32),
                  jnp.zeros((1,), jnp.float32))
        run = jax.jit(lambda s, a: stepper.time_step(spec, params, s, a))
        state, _ = run(sc.state0, action)
        # device_get, not block_until_ready: on the axon tunnel the FIRST
        # execution's block returns immediately (measured round 4) -- only a
        # host fetch reliably waits for it
        jax.device_get(state.pos)

        def once():
            s, _ = run(state, action)
            jax.device_get(s.pos)
    else:
        T = 2
        # TRACE_BATCH=B > 1: trace the vmapped B-rollout program instead
        # (the round-5 batched-rollout collapse: batch=4 measured 6.4x
        # below batch-linear with hbm_util DOWN -- this trace is how the
        # pathological op gets named)
        B = int(os.environ.get("TRACE_BATCH", "1"))
        dpos = np.zeros((T, 1, 3))
        dpos[:, 0, 2] = -4e-4
        actions = (jnp.asarray(dpos, jnp.float32),
                   jnp.zeros((T, 1, 3), jnp.float32),
                   jnp.zeros((T, 1), jnp.float32))
        if B > 1:
            rng = np.random.default_rng(0)
            actions = jax.tree.map(
                lambda a: jnp.broadcast_to(a, (B,) + a.shape)
                + 2e-5 * rng.normal(size=(B,) + a.shape).astype(np.float32),
                actions)

        def fwd_bwd(acts):
            final, buffers = stepper.simulate(spec, params, sc.state0, acts)
            seed_pos, seed_ar = sc.seed_loss(buffers)
            res = adjoint.backward(spec, params, buffers, seed_pos, seed_ar)
            return res.gripper_grad

        run = jax.jit(jax.vmap(fwd_bwd) if B > 1 else fwd_bwd)
        jax.device_get(run(actions))

        def once():
            jax.device_get(run(actions))

    logdir = "/tmp/jax_trace"
    os.system(f"rm -rf {logdir}")
    t0 = time.perf_counter()
    with jax.profiler.trace(logdir):
        once()
    wall = time.perf_counter() - t0
    print(f"traced run: {wall*1e3:.1f} ms")

    xplanes = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    assert xplanes, "no xplane captured"
    from collections import defaultdict

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(xplanes[0], "rb") as f:
        xs.ParseFromString(f.read())
    for plane in xs.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        meta = {m_id: m.name for m_id, m in plane.event_metadata.items()}
        for line in plane.lines:
            if "step" in line.name.lower():
                continue
            tot = defaultdict(float)
            cnt = defaultdict(int)
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                tot[name] += ev.duration_ps / 1e9  # ms
                cnt[name] += 1
            if not tot:
                continue
            print(f"\n=== plane: {plane.name} / line: {line.name} ===")
            items = sorted(tot.items(), key=lambda kv: -kv[1])
            total = sum(tot.values())
            print(f"total line time {total:.1f} ms "
                  f"({len(line.events)} events)")
            for name, t in items[:45]:
                print(f"{t:10.2f} ms  x{cnt[name]:<6} {name[:110]}")


if __name__ == "__main__":
    main()
