"""Multi-device tests on the virtual 8-device CPU mesh: sharded population
evaluation, distributed training step, and the driver entry contracts."""
import importlib.util
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from thinshelllab_tpu.parallel import mesh as pmesh
from thinshelllab_tpu.scenes import folding
from thinshelllab_tpu.train.cmaes import CMAESDriver


@pytest.fixture(scope="module")
def scene():
    return folding.make(table_n=4, max_newton_iter=2)


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_population_rewards(scene):
    m = pmesh.make_mesh(8)
    B, T = 8, 2
    acts = (
        jnp.zeros((B, T, 1, 3)),
        jnp.zeros((B, T, 1, 3)),
        jnp.zeros((B, T, 1)),
    )
    rewards = pmesh.sharded_population_rewards(
        m, scene.spec, scene.params, scene.state0, acts,
        scene.rewards["default"],
    )
    assert rewards.shape == (B,)
    assert np.all(np.isfinite(np.asarray(rewards)))


def test_cmaes_driver_with_mesh(scene):
    m = pmesh.make_mesh(8)
    drv = CMAESDriver(scene, tot_timestep=2, abs_step=2, pop_size=8, mesh=m)
    info = drv.generation()
    assert np.isfinite(info["best_reward"])


def test_sharded_matches_single_device_on_cg_dia_path():
    """Sharded population rewards must equal the single-device batched
    rollout bit-for-bit on the PRODUCTION solver stack (active DIA plan +
    smoothed PCG + BCR/GMRES adjoint path) -- the configuration bench.py
    runs, which round 2 never exercised under shard_map (the round-2 dryrun
    used the dense solver on a below-sublane cloth)."""
    from thinshelllab_tpu.engine import gridsolve
    from thinshelllab_tpu.scenes import bench_scene

    sc = bench_scene.make(cloth_N=8, table_n=4, dtype=jnp.float64,
                          solver="cg", max_newton_iter=2, cg_max_iter=40,
                          cg_tol=1e-8)
    assert sc.spec.dia is not None
    assert gridsolve.build_grid_plan(sc.spec)

    m = pmesh.make_mesh(8)
    B, T = 8, 2
    rng = np.random.default_rng(3)
    acts = (
        jnp.asarray(rng.normal(size=(B, T, sc.n_part, 3)) * 1e-4),
        jnp.zeros((B, T, sc.n_part, 3)),
        jnp.zeros((B, T, sc.n_part)),
    )
    reward_fn = sc.rewards["default"]
    r_sharded = pmesh.sharded_population_rewards(
        m, sc.spec, sc.params, sc.state0, acts, reward_fn)
    r_single = pmesh.batched_rollout_rewards(
        sc.spec, sc.params, sc.state0, acts, reward_fn)
    np.testing.assert_allclose(np.asarray(r_sharded), np.asarray(r_single),
                               rtol=1e-12)
    assert np.all(np.isfinite(np.asarray(r_sharded)))


def test_graft_entry_contract():
    spec = importlib.util.spec_from_file_location(
        "graft", os.path.join(os.path.dirname(__file__), "..",
                              "__graft_entry__.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    fn, args = m.entry()
    out = jax.jit(fn)(*args)
    assert np.all(np.isfinite(np.asarray(out)))
    m.dryrun_multichip(8)


def test_import_purity_and_dryrun_subprocess():
    """Round-3 driver failure (MULTICHIP_r03.json): dryrun_multichip imported
    package modules BEFORE forcing the CPU platform, and a module-scope jnp
    constant initialized the pinned (unhealthy) TPU backend. This test runs
    in a FRESH interpreter without conftest's CPU forcing and asserts that
    (a) importing every thinshelllab_tpu module initializes NO jax backend,
    and (b) dryrun_multichip itself completes on the CPU platform."""
    import subprocess
    import sys
    import textwrap

    root = os.path.join(os.path.dirname(__file__), "..")
    child = textwrap.dedent("""
        import importlib, importlib.util, os, pkgutil, sys
        import jax
        import jax._src.xla_bridge as xb
        # keep the child off the exclusive TPU even if the purity invariant
        # regresses: a violating import then inits the CPU backend instead,
        # which backends_are_initialized() still catches.
        jax.config.update("jax_platforms", "cpu")
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("TSL_TEST_CACHE", "/tmp/tsl_test_jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        assert not xb.backends_are_initialized(), "backend live before imports"
        import thinshelllab_tpu
        for info in pkgutil.walk_packages(
                thinshelllab_tpu.__path__, "thinshelllab_tpu."):
            # libtsl_topology.so is a plain-C ctypes library living in the
            # package tree (loaded via ctypes.CDLL, not import); pkgutil
            # lists it as an extension module but it has no PyInit_ symbol
            if info.name.rsplit(".", 1)[-1].startswith("libtsl"):
                continue
            importlib.import_module(info.name)
        assert not xb.backends_are_initialized(), (
            "importing the package initialized a jax backend (device op at "
            "module scope)")
        spec = importlib.util.spec_from_file_location(
            "graft", os.path.join(sys.argv[1], "__graft_entry__.py"))
        m = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(m)
        assert not xb.backends_are_initialized(), (
            "loading __graft_entry__ initialized a jax backend")
        m.dryrun_multichip(2)
        assert jax.devices()[0].platform == "cpu"
        print("PURITY_OK")
    """)
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    res = subprocess.run(
        [sys.executable, "-c", child, root], env=env, capture_output=True,
        text=True, timeout=1200, cwd=root,
    )
    assert res.returncode == 0, (
        f"child failed\nstdout:\n{res.stdout}\nstderr:\n{res.stderr[-4000:]}"
    )
    assert "PURITY_OK" in res.stdout


def test_sharded_matches_single_device_on_hash_broadphase():
    """Sharded vs single-device equivalence with the spatial-hash
    broadphase engaged (hash_min_faces forced to 0): the hash's
    sort/searchsorted/gather pipeline runs inside shard_map exactly as the
    dense sweep does. Complements the cg-dia case above -- no production
    path should first meet shard_map in production."""
    import dataclasses

    from thinshelllab_tpu.scenes import bench_scene

    sc = bench_scene.make(cloth_N=32, table_n=4, dtype=jnp.float64,
                          solver="cg", max_newton_iter=2, cg_max_iter=40,
                          cg_tol=1e-8)
    con = dataclasses.replace(sc.spec.contact, hash_min_faces=0)
    spec = dataclasses.replace(sc.spec, contact=con)
    assert any(h is not None for h in con.hash_desc)

    m = pmesh.make_mesh(8)
    B, T = 8, 2
    rng = np.random.default_rng(7)
    acts = (
        jnp.asarray(rng.normal(size=(B, T, sc.n_part, 3)) * 1e-4),
        jnp.zeros((B, T, sc.n_part, 3)),
        jnp.zeros((B, T, sc.n_part)),
    )
    reward_fn = sc.rewards["default"]
    r_sharded = pmesh.sharded_population_rewards(
        m, spec, sc.params, sc.state0, acts, reward_fn)
    r_single = pmesh.batched_rollout_rewards(
        spec, sc.params, sc.state0, acts, reward_fn)
    np.testing.assert_allclose(np.asarray(r_sharded), np.asarray(r_single),
                               rtol=1e-12)
    assert np.all(np.isfinite(np.asarray(r_sharded)))
