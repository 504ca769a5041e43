"""Smoke tests: every registered scene builds and simulates a few steps
without NaNs, with sane contact activity."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from thinshelllab_tpu.engine import stepper
from thinshelllab_tpu.scenes import registry

SCENE_NAMES = ["folding", "lifting", "sliding", "card", "pick", "forming",
               "balancing", "bouncing", "interact"]


@pytest.mark.parametrize("name", SCENE_NAMES)
def test_scene_forward(name):
    sc = registry.make_scene(name, max_newton_iter=5)
    spec = sc.spec
    T = 2
    G = max(sc.n_part, 1)
    dpos = np.zeros((T, G, 3))
    if sc.n_part:
        dpos[:, :, 2] = -0.0002
    actions = (
        jnp.asarray(dpos[:, : sc.n_part or 0]),
        jnp.zeros((T, sc.n_part, 3)),
        jnp.zeros((T, sc.n_part)),
    )
    final, buffers = jax.jit(
        lambda a: stepper.simulate(spec, sc.params, sc.state0, a)
    )(actions)
    pos = np.asarray(buffers["pos"])
    assert np.all(np.isfinite(pos)), name
    # the scene should not explode: displacement bounded
    disp = np.abs(pos[-1] - pos[0]).max()
    assert disp < 0.05, (name, disp)
    r = float(sc.reward(buffers))
    assert np.isfinite(r), name


def test_registry_unknown():
    with pytest.raises(KeyError):
        registry.make_scene("nope")


def test_native_topology_parity():
    """Native C topology builders must agree exactly with the Python ones."""
    import os
    import numpy as np
    from thinshelllab_tpu import native
    from thinshelllab_tpu.core import topology, builder

    if native.get_lib() is None:
        import pytest
        pytest.skip("no native lib / compiler")

    # cloth tables
    N, M = 9, 5
    nat = native.cloth_mesh_tables(N, M)
    os.environ["TSL_NO_NATIVE"] = "1"
    try:
        native._tried = False
        native._lib = None
        py = topology.build_cloth_mesh(N, M)
    finally:
        del os.environ["TSL_NO_NATIVE"]
        native._tried = False
        native._lib = None
    np.testing.assert_array_equal(nat[0], py.f2v)
    np.testing.assert_array_equal(nat[1], py.counter_face)
    np.testing.assert_array_equal(nat[2], py.counter_point)
    np.testing.assert_array_equal(nat[3], py.indices)

    # hinges
    rng = np.random.default_rng(0)
    pos = rng.normal(size=(py.NV, 3)) * 0.01
    hv_n, st_n, m_n = native.build_hinges(py.f2v, py.counter_face,
                                          py.counter_point, pos)
    hv_p, st_p, m_p = builder._build_hinges.__wrapped__(py, pos) if hasattr(
        builder._build_hinges, "__wrapped__") else _py_hinges(py, pos)
    np.testing.assert_array_equal(hv_n, hv_p)
    np.testing.assert_array_equal(st_n, st_p)
    np.testing.assert_array_equal(m_n, m_p)

    # cube tets
    t_n = native.cube_tets(4, 3, 2)
    os.environ["TSL_NO_NATIVE"] = "1"
    try:
        native._tried = False
        native._lib = None
        mesh = topology.build_cube_tet_mesh(4, 3, 2, 0.03)
    finally:
        del os.environ["TSL_NO_NATIVE"]
        native._tried = False
        native._lib = None
    np.testing.assert_array_equal(t_n, mesh.tets)


def _py_hinges(mesh, pos):
    import os
    from thinshelllab_tpu import native
    from thinshelllab_tpu.core import builder
    os.environ["TSL_NO_NATIVE"] = "1"
    try:
        native._tried = False
        native._lib = None
        return builder._build_hinges(mesh, pos)
    finally:
        del os.environ["TSL_NO_NATIVE"]
        native._tried = False
        native._lib = None


def test_balance_warm_start_bundled():
    """The bundled pre-grasped state (reference data/balance_state,
    Scene_balancing.load_all:202-222) loads, has latched gripper contacts,
    and holds the grasp through further steps."""
    import os

    from thinshelllab_tpu.scenes import balancing
    from thinshelllab_tpu.utils import checkpoint

    path = balancing.bundled_state_path()
    assert os.path.exists(path), "balance_state.npz must ship with the repo"
    sc = registry.make_scene("balancing", max_newton_iter=8)
    st = checkpoint.load_state(path)
    st = jax.tree.map(
        lambda a, b: np.asarray(a, np.asarray(b).dtype), st, sc.state0)
    assert int(np.asarray(st.proj_flag).sum()) > 0
    assert float(np.asarray(st.gripper.dist).max()) < 0  # closed, not cold
    T, n = 2, sc.n_part
    acts = (jnp.zeros((T, n, 3)), jnp.zeros((T, n, 3)), jnp.zeros((T, n)))
    final, _ = stepper.rollout(sc.spec, sc.params, st, acts)
    pos = np.asarray(final.pos)
    assert np.all(np.isfinite(pos))
    # sheet stays pinched: cloth center z within a few mm of the grip plane
    cloth_z = pos[: sc.spec.body_v_end[0], 2]
    assert np.abs(cloth_z).max() < 0.02


def test_make_grasped_state_smoke():
    from thinshelllab_tpu.scenes import balancing

    sc = registry.make_scene("balancing", max_newton_iter=6)
    st = balancing.make_grasped_state(sc, close_steps=3, settle_steps=1)
    assert np.all(np.isfinite(np.asarray(st.pos)))


def test_objective_variant_seed_selection():
    """Reward variants resolve to their dedicated adjoint seeds (reference
    per-driver flags: trajopt_interact.py --sep / trajopt_balancing.py
    --throwing select reward+loss PAIRS); unknown names fall back to the
    default seed. The interact 'following' seed (get_loss_interact_1,
    analytic_grad_single.py:423-427) is +1 on box x at the final step."""
    from thinshelllab_tpu.scenes import balancing, interact, pick

    sc = balancing.make()
    assert sc.seed_for("compute_reward_throwing") is sc.seed_loss_throwing
    assert sc.seed_for("compute_reward_throwing_RL") is sc.seed_loss_throwing
    assert sc.seed_for("default") is sc.seed_loss
    assert sc.seed_for("compute_reward_all") is sc.seed_loss  # fallback
    assert "compute_reward_throwing_RL" in sc.rewards

    sc2 = interact.make()
    seed1 = sc2.seed_for("compute_reward_1")
    assert seed1 is not sc2.seed_loss
    T = 3
    buffers = {"pos": jnp.zeros((T, sc2.spec.NV, 3))}
    pg, ar = seed1(buffers)
    bs, be = sc2.spec.body_v_start[4], sc2.spec.body_v_end[4]
    assert float(pg[T - 1, bs:be, 0].min()) == 1.0
    assert float(jnp.abs(pg[: T - 1]).max()) == 0.0  # final step only
    assert float(jnp.abs(ar).max()) == 0.0

    sc3 = pick.make()
    assert sc3.seed_for("compute_reward_pick_fold") is sc3.seed_loss_pick_fold


def test_auto_solver_resolves_by_size():
    """solver='auto' picks the dense factorization below the DOF cutoff
    (every reference-sized task scene) and the iterative stack above it
    (the 10k-tri bench)."""
    import jax.numpy as jnp

    from thinshelllab_tpu.scenes import bench_scene, folding

    small = folding.make(table_n=4, solver="auto", max_newton_iter=2)
    assert small.spec.solver == "dense"
    big = bench_scene.make(cloth_N=40, dtype=jnp.float32, solver="auto",
                           max_newton_iter=2)
    assert big.spec.solver == "cg"
    assert big.spec.dia is not None
