"""Benchmark: fwd+bwd simulation step throughput on the ~10k-triangle
folding/draping scene (BASELINE.json headline metric), on the available
accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference (Taichi CPU kernels + dense-storage SparseMatrix
with cuSPARSE direct solve) publishes no numbers and cannot run in this
image (no taichi/cupy). BASELINE.md records the estimate used here:
REF_STEPS_PER_SEC = 0.5 for a 10k-triangle scene (the reference's
dense-storage Hessian alone is O((3NV)^2) ~ 2.4 GB at this size; its
~500-vertex scenes run at seconds/iteration on CPU per the driver prints it
was instrumented with). The target is 50x => vs_baseline >= 50.
"""
import json
import os
import sys
import time

# measured upper bound on the CPU reference: its sparse solve alone costs
# 0.228 s x 8 Newton iters/step at bench size (scripts/measure_ref_floor.py,
# BASELINE.md) => <= 0.549 steps/s; 0.5 over-credits the reference
REF_STEPS_PER_SEC = 0.5


def main():
    import jax

    # Persistent XLA compile cache (same mechanism tests/conftest.py uses
    # for the suite): the bench program is identical across invocations at
    # fixed config, so every run after the first skips the ~2 min TPU
    # compile and deserializes the executable instead. compile_s then
    # reports the cache-hit cost; first_run_s still reflects any residual
    # device-side work. BENCH_NO_CACHE=1 disables (for measuring true
    # cold-compile time).
    if not os.environ.get("BENCH_NO_CACHE"):
        cache_dir = os.environ.get(
            "BENCH_CACHE_DIR",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".xla_bench_cache"))
        try:
            os.makedirs(cache_dir, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 0.5)
        except Exception as e:  # pragma: no cover
            print(f"# WARNING: compile cache unavailable ({e})",
                  file=sys.stderr)

    # BENCH_PLATFORM=cpu: run the bench on the CPU backend (compile-time
    # proxy measurements; also the escape hatch when the TPU tunnel is
    # down -- this image's sitecustomize pins every process to the TPU and
    # a dead tunnel hangs the device claim)
    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    else:
        # dead-tunnel watchdog: the TPU claim inside jax.devices() blocks
        # forever (in C, uninterruptible) when the tunnel's remote end is
        # down, which would leave the whole bench hung with no output. A
        # healthy claim takes seconds; if it hasn't finished in 120 s,
        # re-exec this process onto the CPU backend so the run always
        # emits its one JSON line (platform is part of the metric string).
        import threading

        claimed = threading.Event()

        def _watchdog():
            if not claimed.wait(120.0):
                sys.stderr.write(
                    "bench: device claim hung >120s (TPU tunnel down?); "
                    "re-exec on CPU backend\n")
                env = dict(os.environ, BENCH_PLATFORM="cpu")
                os.execve(sys.executable,
                          [sys.executable, os.path.abspath(__file__)], env)

        threading.Thread(target=_watchdog, daemon=True).start()
        jax.devices()
        claimed.set()
    import jax.numpy as jnp
    import numpy as np

    from thinshelllab_tpu.engine import adjoint, stepper
    from thinshelllab_tpu.scenes import bench_scene

    cloth_N = int(os.environ.get("BENCH_CLOTH_N", "70"))
    T = int(os.environ.get("BENCH_STEPS", "8"))
    dtype = jnp.float32 if os.environ.get("BENCH_DTYPE", "f32") == "f32" else jnp.float64
    # modified-Newton operator staleness (same fixed point; see
    # tests/test_assembly.py::test_hess_refresh_same_fixed_point)
    # measured A/B (round 4): refresh=4 beats 2 by ~3% at bench size (the
    # staler operator costs some CG iterations but halves the rebuilds);
    # round 5: refresh=8 (ONE rebuild per step) beats 4 by +25% (6.60 vs
    # 5.26 steps/s) -- the residual stays fresh, so the fixed point is
    # unchanged and the |p| termination still guards convergence
    refresh = int(os.environ.get("BENCH_HESS_REFRESH", "8"))
    # forward-Newton CG tolerance (spec.fwd_tol; measured A/B round 4:
    # 1e-3 vs 1e-6 is +74% steps/s -- the line search + |p| termination
    # absorb the inexact directions). The ADJOINT solves keep cg_tol=1e-6
    # so gradient accuracy is unchanged.
    fwd_tol = float(os.environ.get("BENCH_CG_TOL", "1e-3"))
    # adjoint Krylov tolerance (spec.adj_tol): the f32 adjoint solves floor
    # at ~7e-4 relative residual (BASELINE.md), so tolerances below the
    # floor only burn stall-detection iterations. Accuracy impact measured
    # by scripts/grad_accuracy.py before this default changed.
    adj_tol = os.environ.get("BENCH_ADJ_TOL")
    adj_tol = float(adj_tol) if adj_tol else None
    # adjoint matmul precision (A/B knob): "solves" (default) = true-f32
    # MXU passes scoped to the adjoint solves + backward chains (the
    # on-chip gradient-accuracy fix, 5.5e-2 -> 1.9e-3 adjoint-isolated rel
    # err on bench24, at ~0 cost); "highest" = whole backward sweep
    # (measured -10% steps/s); "default"/"none" inherits the TPU default
    # (bf16 passes)
    adj_prec = os.environ.get("BENCH_ADJ_PREC", "solves")
    if adj_prec.lower() in ("", "none", "default"):
        adj_prec = None
    # BENCH_TAPE_CONTACTS=1: save each forward step's contact set in the
    # trajectory tape and skip the adjoint's per-backward-step broadphase +
    # contact-analysis replay (stepper.simulate save_contacts)
    tape_contacts = os.environ.get("BENCH_TAPE_CONTACTS", "0") == "1"
    # BENCH_COMP=1: compensated (TwoSum) backward-chain carries -- measured
    # 2.3x adjoint accuracy on the plastic scene (BASELINE.md round 5);
    # cost A/B knob for the latency-bound sweep
    comp_carries = os.environ.get("BENCH_COMP", "0") == "1"
    # BENCH_FWD_CHUNK / BENCH_BWD_CHUNK: host-stitched scan segments
    # (stepper.simulate_chunked / adjoint.backward_chunked, both bit-exact
    # vs the single-program forms) -- the workaround for this image's TPU
    # worker kernel-faulting on certain long/large single-program scans
    # (the 40k-tri backward, the folding T=50 forward). Incompatible with
    # BENCH_BATCH (the chunked drivers run their own per-segment jits).
    fwd_chunk = int(os.environ.get("BENCH_FWD_CHUNK", "0"))
    bwd_chunk = int(os.environ.get("BENCH_BWD_CHUNK", "0"))

    n_tri = 2 * cloth_N * cloth_N
    # BENCH_BATCH=B > 1: vmap B independent fwd+bwd rollouts into ONE XLA
    # program and report env.steps/s = B*T/wall (VERDICT r4 item 2). The
    # single-env step is latency/dispatch-bound (mfu ~6e-4), so batched
    # envs share each dispatch and throughput scales far better than 1x --
    # the TPU-native parallelism story the reference's subprocess SB3 envs
    # (training_env.py:64) and serial CMA-ES loop (run_cmaes_all.py:174)
    # cannot match.
    B = int(os.environ.get("BENCH_BATCH", "1"))

    dpos = np.zeros((T, 1, 3), dtype=np.float64)
    dpos[:, 0, 2] = -0.0004
    actions = (
        jnp.asarray(dpos, dtype),
        jnp.zeros((T, 1, 3), dtype),
        jnp.zeros((T, 1), dtype),
    )
    if B > 1:
        # per-env jitter so the B rollouts are genuinely distinct work
        rng = np.random.default_rng(0)
        dposb = np.broadcast_to(dpos, (B,) + dpos.shape).copy()
        dposb += 2e-5 * rng.normal(size=dposb.shape)
        actions = (
            jnp.asarray(dposb, dtype),
            jnp.zeros((B, T, 1, 3), dtype),
            jnp.zeros((B, T, 1), dtype),
        )

    # BENCH_NEWTON: Newton micro-iteration cap (default 8 = the reference's
    # bench budget). The |p| termination test is floored at the f32
    # resolution and in practice never fires before the cap at bench size,
    # so the cap IS the iteration count -- if the per-iteration |p| history
    # (scripts/probe_newton_tpu.py) shows a floor-stall before 8, capping
    # earlier is the same class of win as the round-4 fwd_tol discovery.
    newton_cap = int(os.environ.get("BENCH_NEWTON", "8"))

    def build_and_compile(spmv):
        sc = bench_scene.make(cloth_N=cloth_N, dtype=dtype,
                              hess_refresh=refresh, spmv=spmv,
                              fwd_tol=fwd_tol, adj_tol=adj_tol,
                              max_newton_iter=newton_cap)
        import dataclasses as _dc

        # BENCH_HASH_MIN_FACES: override the spatial-hash crossover (set
        # very high to force the dense sweep at any size -- 40k-crash triage)
        hmf = os.environ.get("BENCH_HASH_MIN_FACES")
        if hmf:
            sc.spec = _dc.replace(
                sc.spec, contact=_dc.replace(
                    sc.spec.contact, hash_min_faces=int(hmf)))
        # BENCH_SPD=shift: Gershgorin-shift PSD-ification of the forward
        # element Hessians instead of the batched-eigh clamp (A/B knob --
        # the eigh custom call runs 2x/step in the operator rebuilds; the
        # adjoint always uses the exact unprojected Hessian either way)
        spd_m = os.environ.get("BENCH_SPD")
        if spd_m:
            sc.spec = _dc.replace(sc.spec, spd_method=spd_m)
        spec, params = sc.spec, sc.params

        def fwd_bwd(acts):
            final, buffers = stepper.simulate(spec, params, sc.state0, acts,
                                              save_contacts=tape_contacts)
            seed_pos, seed_ar = sc.seed_loss(buffers)
            res = adjoint.backward(spec, params, buffers, seed_pos, seed_ar,
                                   matmul_precision=adj_prec,
                                   compensated=comp_carries)
            return res.gripper_grad, buffers["pos"][-1]

        if (fwd_chunk or bwd_chunk) and B == 1:
            # host-stitched multi-program mode: no single AOT-compilable
            # program exists; first_run_s absorbs the per-segment compiles
            # and cost_analysis degrades to zeros
            if fwd_chunk:
                fwd = lambda acts: stepper.simulate_chunked(  # noqa: E731
                    spec, params, sc.state0, acts, fwd_chunk,
                    save_contacts=tape_contacts)
            else:
                fwd = jax.jit(lambda acts: stepper.simulate(
                    spec, params, sc.state0, acts,
                    save_contacts=tape_contacts))
            if bwd_chunk:
                def bwd(buffers, seed_pos, seed_ar):
                    return adjoint.backward_chunked(
                        spec, params, buffers, seed_pos, seed_ar, bwd_chunk,
                        matmul_precision=adj_prec, compensated=comp_carries)
            else:
                bwd = jax.jit(lambda b, sp, sa: adjoint.backward(
                    spec, params, b, sp, sa, matmul_precision=adj_prec,
                    compensated=comp_carries))
            seed_fn = jax.jit(sc.seed_loss)

            def run_chunked(acts):
                final, buffers = fwd(acts)
                seed_pos, seed_ar = seed_fn(buffers)
                res = bwd(buffers, seed_pos, seed_ar)
                return res.gripper_grad, buffers["pos"][-1]

            return sc, spec, run_chunked, None, 0.0

        run = jax.jit(jax.vmap(fwd_bwd) if B > 1 else fwd_bwd)
        t0 = time.time()
        compiled = run.lower(actions).compile()
        return sc, spec, run, compiled, time.time() - t0

    def pallas_parity_ok():
        """Guard the headline number against a silent Mosaic MISCOMPILE
        (wrong values, not a compile error -- the try/except below only
        catches the latter): solve one small CG system on the Pallas-kernel
        path and check the solution's residual against the independently
        formulated XLA operator. A miscompiled SpMV or preconditioner
        either diverges CG or converges it to the wrong point; both leave
        a large true residual. Costs one small-scene compile (~seconds
        next to the main program's minutes)."""
        from thinshelllab_tpu.engine import elements, solver

        try:
            sc_p = bench_scene.make(cloth_N=12, table_n=4,
                                    dtype=jnp.float32, solver="cg",
                                    spmv="pallas")
            sc_x = bench_scene.make(cloth_N=12, table_n=4,
                                    dtype=jnp.float32, solver="cg",
                                    spmv="xla")
            spec_p, spec_x = sc_p.spec, sc_x.spec
            st0 = sc_x.state0
            pos = jnp.asarray(st0.pos)
            contact, _, _ = stepper.build_contacts(
                spec_x, sc_x.params, pos, pos,
                jnp.asarray(st0.proj_flag), jnp.asarray(st0.proj_dir))

            def check(p):
                groups = elements.all_groups(
                    spec_x, sc_x.params, p, jnp.asarray(st0.ref_angle),
                    contact, with_hess=True, spd=True)
                F = elements.assemble_residual(spec_x, groups, p, p,
                                               jnp.zeros_like(p))
                xp = solver.solve_cg(spec_p, groups, F)
                stx = solver.prepare_solver_state(spec_x, groups, F.dtype)
                A, _ = solver._ops_from_state(spec_x, stx)
                r = F - A(xp)
                return (jnp.linalg.norm(r)
                        / jnp.maximum(jnp.linalg.norm(F), 1e-30))
            rel = float(jax.jit(check)(pos))
            ok = np.isfinite(rel) and rel < 1e-3
            if not ok:
                print(f"# WARNING: Pallas/XLA parity gate failed "
                      f"(rel residual {rel:.2e})", file=sys.stderr)
            return ok
        except Exception as e:  # pragma: no cover - exercised on faults
            print(f"# WARNING: Pallas parity gate errored "
                  f"({type(e).__name__}: {str(e)[:200]})", file=sys.stderr)
            return False

    # resilience: a Mosaic/Pallas compile failure on the custom-kernel path
    # must degrade to the XLA formulation, not kill the benchmark
    spmv_mode = os.environ.get("BENCH_SPMV", "auto")
    if spmv_mode == "auto" and B > 1:
        # vmap lowers pallas_call as a sequential per-batch-element grid
        # loop (batched trace, BASELINE.md round 5); the XLA DIA
        # formulation vmaps into batched einsums instead. Measured on-chip:
        # B=8 full-size 4.39 env.steps/s (xla) vs 3.39 (pallas).
        spmv_mode = "xla"
    if (spmv_mode == "auto" and jax.default_backend() == "tpu"
            and not pallas_parity_ok()):
        print("# WARNING: falling back to spmv='xla'", file=sys.stderr)
        spmv_mode = "xla"
    try:
        sc, spec, run, compiled, compile_s = build_and_compile(spmv_mode)
    except Exception as e:  # pragma: no cover - exercised on kernel faults
        if spmv_mode == "xla":
            raise
        print(f"# WARNING: compile failed with spmv='{spmv_mode}' "
              f"({type(e).__name__}: {str(e)[:200]}); retrying with "
              f"spmv='xla'", file=sys.stderr)
        sc, spec, run, compiled, compile_s = build_and_compile("xla")
    # XLA's own static cost model for the whole fwd+bwd program: logical
    # FLOPs and HBM traffic (fused producers are not double counted).
    # Divided by measured wall time these give achieved-vs-peak utilization
    # -- the roofline tracking VERDICT r2 asked for (hbm_util / mfu fields).
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        prog_flops = float(ca.get("flops", 0.0))
        prog_bytes = float(ca.get("bytes accessed", 0.0))
    except Exception:
        prog_flops = prog_bytes = 0.0

    # warm-up: HOST FETCH, not block_until_ready -- on the axon tunnel the
    # first execution of a program returns from block_until_ready
    # immediately while the device is still working (measured round 4: the
    # timed loop then clocks dispatch latency, producing a nonsense 85k
    # steps/s). A device_get reliably waits. The first execution also does
    # the real device-side compile (~7x the AOT lower+compile call's time),
    # so record it separately.
    t0 = time.time()
    gg, last = run(actions)
    gg = jax.device_get(gg)
    first_run_s = time.time() - t0

    n_rep = int(os.environ.get("BENCH_REPS", "3"))
    t0 = time.time()
    for _ in range(n_rep):
        gg, last = run(actions)
    gg = jax.device_get(gg)  # fetch (~60 ms tunnel RTT), robust vs block
    elapsed = (time.time() - t0) / n_rep

    # fwd+bwd "steps": T forward implicit steps + T adjoint steps count as T
    # combined fwd+bwd steps (the reference metric counts a training step's
    # forward+backward pass over one frame as one unit). With BENCH_BATCH=B
    # the unit is env.steps: B independent rollouts x T steps each.
    steps_per_sec = B * T / elapsed
    finite = bool(np.all(np.isfinite(np.asarray(gg))))

    # peak numbers for the attached chip (axon tunnel = 1x TPU v5e):
    # 819 GB/s HBM, ~49 TFLOP/s f32 on the MXU (bf16 peak 197 / 4)
    PEAK_HBM = 819e9
    PEAK_F32 = 49.2e12
    batch_tag = f", batch={B} envs" if B > 1 else ""
    out = {
        "metric": f"fwd+bwd sim {'env.' if B > 1 else ''}steps/sec "
        f"({n_tri}-tri folding scene{batch_tag}, "
        f"{'f32' if dtype == jnp.float32 else 'f64'}, "
        f"{jax.devices()[0].platform})",
        "value": round(steps_per_sec, 4),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / REF_STEPS_PER_SEC, 2),
        "compile_s": round(compile_s, 1),
        "first_run_s": round(first_run_s, 1),
        "hbm_util": round(prog_bytes / elapsed / PEAK_HBM, 4),
        "mfu": round(prog_flops / elapsed / PEAK_F32, 4),
    }
    print(json.dumps(out))
    if not finite:
        print("WARNING: non-finite gradients in bench run", file=sys.stderr)
    print(
        f"# compile {compile_s:.1f}s, run {elapsed:.2f}s for {T} steps, "
        f"NV={spec.NV}, contacts cap={spec.contact.capacity}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
