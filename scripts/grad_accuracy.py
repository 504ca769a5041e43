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
        T = 8
    else:
        raise SystemExit(f"unknown scene {scene}")
    # A/B knob: loosened adjoint Krylov tolerance on the f32 leg only (the
    # f64 oracle keeps the tight default)
    adj_tol = os.environ.get("GRAD_ACC_ADJ_TOL")
    if adj_tol and dtype_str == "f32":
        sc.spec = sc.spec.replace(adj_tol=float(adj_tol))
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
    # bench24's pad starts ~8 mm above the cloth: descend fast enough to
    # make contact within T steps (else the gripper grad is vacuously zero)
    dpos[:, :, 2] = -4e-4 if scene == "folding" else -1.25e-3
    dpos += 5e-5 * rng.normal(size=dpos.shape)
    acts = (jnp.asarray(dpos, dt), jnp.zeros((T, sc.n_part, 3), dt),
            jnp.zeros((T, sc.n_part), dt))

    # GRAD_ACC_TAPE=1: tape the forward contact sets and differentiate
    # those (stepper.simulate save_contacts; the bench's
    # BENCH_TAPE_CONTACTS mode) so the accuracy of the tape-mode adjoint
    # is measured against a tape-mode oracle
    tape_contacts = os.environ.get("GRAD_ACC_TAPE", "0") == "1"

    # two separate jits: the single fused fwd+bwd folding program
    # reproducibly crashes this image's TPU worker (kernel fault in the
    # combined compile; both halves run fine separately -- round-3 finding)
    _final, buffers = jax.jit(
        lambda a: stepper.simulate(spec, params, sc.state0, a,
                                   save_contacts=tape_contacts))(acts)
    seed_pos, seed_ar = sc.seed_loss(buffers)
    res = jax.jit(
        lambda b, sp, sa: adjoint.backward(spec, params, b, sp, sa)
    )(buffers, seed_pos, seed_ar)
    gg, last_pos = res.gripper_grad, buffers["pos"][-1]
    save = {"gripper_grad": np.asarray(gg, np.float64),
            "last_pos": np.asarray(last_pos, np.float64)}
    if dtype_str == "f64":
        # persist the tape so the f32 adjoint can be measured on the SAME
        # trajectory (isolates adjoint-solve error from forward drift)
        for k, v in buffers.items():
            if k == "contact":
                # ContactSet pytree: flatten per-field (rebuilt on load)
                import dataclasses as _dc

                for f in _dc.fields(v):
                    save[f"tapecon_{f.name}"] = np.asarray(
                        getattr(v, f.name))
            else:
                save[f"tape_{k}"] = np.asarray(v, np.float64)
    np.savez(out_path, **save)
    print(f"[{dtype_str}/{scene}] grad norm "
          f"{float(np.linalg.norm(np.asarray(gg))):.6e} -> {out_path}")


def run_adjoint_on_tape(scene, tape_path, out_path):
    """f32 (default-device) adjoint on the f64 reference tape: the backward
    sweep -- rebuild contacts, Hessians, GMRES/MINRES adjoint solves at
    floored f32 tolerances -- runs on the IDENTICAL trajectory the f64
    oracle differentiated, so the gradient difference is pure adjoint/solve
    error (the number VERDICT r2 asked for), uncontaminated by f32 forward
    drift through the chaotic contact dynamics."""
    import jax
    import jax.numpy as jnp

    from thinshelllab_tpu.engine import adjoint

    sc, _T = _build(scene, "f32")
    spec, params = sc.spec, sc.params
    # GRAD_ACC_MM_PREC: matmul-precision scope A/B ("solves" default /
    # "highest" / "none")
    mm = os.environ.get("GRAD_ACC_MM_PREC", "solves")
    mm = None if mm.lower() in ("", "none", "default") else mm
    z = np.load(tape_path)
    buffers = {k[5:]: jnp.asarray(z[k], jnp.float32)
               for k in z.files if k.startswith("tape_")}
    # integer/bool tape entries must not be cast to float
    for k, dt_ in (("final_proj_flag", jnp.int32),
                   ("final_proj_dir", jnp.int32),
                   ("yield_gate", jnp.bool_)):
        if k in buffers:
            buffers[k] = jnp.asarray(np.asarray(z[f"tape_{k}"]), dt_)
    # taped contact sets (GRAD_ACC_TAPE oracle): rebuild the ContactSet
    # pytree; float leaves go to f32, int/bool leaves keep their dtype
    if any(k.startswith("tapecon_") for k in z.files):
        from thinshelllab_tpu.core.spec import ContactSet

        def _cast(a):
            a = np.asarray(a)
            return jnp.asarray(a, jnp.float32
                               if a.dtype.kind == "f" else a.dtype)

        buffers["contact"] = ContactSet(
            **{k[8:]: _cast(z[k]) for k in z.files
               if k.startswith("tapecon_")})
    # GRAD_ACC_COMP=1: compensated (TwoSum) backward-chain carries
    comp = os.environ.get("GRAD_ACC_COMP", "0") == "1"
    seed_pos, seed_ar = sc.seed_loss(buffers)
    res = jax.jit(
        lambda b, sp, sa: adjoint.backward(spec, params, b, sp, sa,
                                           matmul_precision=mm,
                                           compensated=comp)
    )(buffers, seed_pos, seed_ar)
    gg = res.gripper_grad
    np.savez(out_path, gripper_grad=np.asarray(gg, np.float64),
             last_pos=np.asarray(z["last_pos"], np.float64))
    print(f"[f32-adjoint-on-f64-tape/{scene}] grad norm "
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
    # --cpu: run the f32 legs on the CPU backend too (e.g. when the TPU
    # tunnel is down); the f64 leg always forces CPU
    if "--cpu" in sys.argv:
        sys.argv.remove("--cpu")
        os.environ["GRAD_ACC_CPU"] = "1"
    if os.environ.get("GRAD_ACC_CPU"):
        import jax

        jax.config.update("jax_platforms", "cpu")
    mode = sys.argv[1]
    if mode == "run":
        run(sys.argv[2], sys.argv[3], sys.argv[4])
    elif mode == "adjoint":
        run_adjoint_on_tape(sys.argv[2], sys.argv[3], sys.argv[4])
    elif mode == "compare":
        compare(sys.argv[2], sys.argv[3])
    elif mode == "all":
        scene = sys.argv[2]
        pa, pb = f"/tmp/grad_{scene}_f32.npz", f"/tmp/grad_{scene}_f64.npz"
        pc = f"/tmp/grad_{scene}_f32adj.npz"
        here = os.path.abspath(__file__)
        for d, p in (("f32", pa), ("f64", pb)):
            subprocess.run([sys.executable, here, "run", d, scene, p],
                           check=True)
        subprocess.run([sys.executable, here, "adjoint", scene, pb, pc],
                       check=True)
        print("end-to-end (includes f32 forward drift):")
        compare(pa, pb, scene)
        print("adjoint-isolated (same f64 tape):")
        compare(pc, pb, scene)
    else:
        raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
