"""Measure the TPU-config (f32 + iterative solver, floored tolerances)
gripper-gradient error against the f64 + dense-solve oracle — the
measurement VERDICT r2 flagged as missing: every gradient test runs forced
CPU f64, so the accuracy of the path that actually runs on the TPU was
unquantified against the <=1e-4 agreement criterion (BASELINE.json;
reference tolerances BaseScene.py:1342, sparse_solver.py:100).

Two sub-runs per scene (separate processes, because sitecustomize pins the
default backend):

  python scripts/grad_accuracy.py run f32 <scene> <out.npz>   # default dev
  python scripts/grad_accuracy.py run f64 <scene> <out.npz>   # forces CPU
  python scripts/grad_accuracy.py compare a.npz b.npz

or the all-in-one driver (runs both + compares, printing one JSON line):

  python scripts/grad_accuracy.py all <scene>

Scenes: 'folding' (plastic cloth, MINRES adjoint — no DIA plan at M+1=4)
and 'bench24' (bench contact scene at cloth_N=24 with an active DIA plan:
smoothed-PCG forward + BCR-grid GMRES adjoint, the production TPU stack).
"""
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _build(scene, dtype_str):
    import jax.numpy as jnp

    from thinshelllab_tpu.scenes import bench_scene, folding

    dtype = jnp.float32 if dtype_str == "f32" else jnp.float64
    solver = "cg" if dtype_str == "f32" else "dense"
    if scene == "folding":
        sc = folding.make(dtype=dtype, solver=solver, max_newton_iter=8)
        T = 10
    elif scene == "bench24":
        sc = bench_scene.make(cloth_N=24, dtype=dtype, solver=solver,
                              max_newton_iter=8)
        T = 6
    else:
        raise SystemExit(f"unknown scene {scene}")
    return sc, T


def run(dtype_str, scene, out_path):
    import jax

    if dtype_str == "f64":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from thinshelllab_tpu.engine import adjoint, stepper

    sc, T = _build(scene, dtype_str)
    spec, params = sc.spec, sc.params
    dt = spec.dtype

    rng = np.random.default_rng(11)
    dpos = np.zeros((T, sc.n_part, 3))
    dpos[:, :, 2] = -4e-4
    dpos += 5e-5 * rng.normal(size=dpos.shape)
    acts = (jnp.asarray(dpos, dt), jnp.zeros((T, sc.n_part, 3), dt),
            jnp.zeros((T, sc.n_part), dt))

    def fwd_bwd(a):
        _final, buffers = stepper.simulate(spec, params, sc.state0, a)
        seed_pos, seed_ar = sc.seed_loss(buffers)
        res = adjoint.backward(spec, params, buffers, seed_pos, seed_ar)
        return res.gripper_grad, buffers["pos"][-1]

    gg, last_pos = jax.jit(fwd_bwd)(acts)
    np.savez(out_path, gripper_grad=np.asarray(gg, np.float64),
             last_pos=np.asarray(last_pos, np.float64))
    print(f"[{dtype_str}/{scene}] grad norm "
          f"{float(np.linalg.norm(np.asarray(gg))):.6e} -> {out_path}")


def compare(a_path, b_path, scene="?"):
    a = np.load(a_path)
    b = np.load(b_path)
    g32, g64 = a["gripper_grad"], b["gripper_grad"]
    denom = np.linalg.norm(g64)
    rel = float(np.linalg.norm(g32 - g64) / max(denom, 1e-300))
    # forward drift sanity: if the f32 ROLLOUT already left the f64
    # trajectory, gradient disagreement is trajectory divergence, not
    # adjoint error
    pdrift = float(np.linalg.norm(a["last_pos"] - b["last_pos"])
                   / max(np.linalg.norm(b["last_pos"]), 1e-300))
    out = {"scene": scene, "grad_rel_err": rel, "fwd_pos_rel_drift": pdrift,
           "pass_1e-4": rel <= 1e-4}
    print(json.dumps(out))
    return out


def main():
    mode = sys.argv[1]
    if mode == "run":
        run(sys.argv[2], sys.argv[3], sys.argv[4])
    elif mode == "compare":
        compare(sys.argv[2], sys.argv[3])
    elif mode == "all":
        scene = sys.argv[2]
        pa, pb = f"/tmp/grad_{scene}_f32.npz", f"/tmp/grad_{scene}_f64.npz"
        here = os.path.abspath(__file__)
        for d, p in (("f32", pa), ("f64", pb)):
            subprocess.run([sys.executable, here, "run", d, scene, p],
                           check=True)
        compare(pa, pb, scene)
    else:
        raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
