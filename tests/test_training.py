"""Training-layer tests: trajopt driver iteration, CMA-ES batched
evaluation, parameter optimization, RL env step, checkpoint round-trip."""
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from thinshelllab_tpu.scenes import folding, bouncing
from thinshelllab_tpu.train.cmaes import CMAES, CMAESDriver, decode_genome
from thinshelllab_tpu.train.dp import ParamOptDriver
from thinshelllab_tpu.train.trajopt import TrajOptDriver
from thinshelllab_tpu.train.rl_env import Env
from thinshelllab_tpu.utils import checkpoint


@pytest.fixture(scope="module")
def scene():
    return folding.make(table_n=5, max_newton_iter=5)


def test_trajopt_iteration(scene):
    drv = TrajOptDriver(scene, tot_timestep=4, lr=1e-3)
    # warm start: push the pad down into contact so gradients flow
    for t in range(1, 4):
        drv.agent.traj[t, 0, 2] = -0.0007 * t
    info = drv.iteration()
    assert np.isfinite(info["reward"])
    assert np.isfinite(info["grad_norm"])
    assert info["grad_norm"] > 0
    info2 = drv.iteration()
    assert np.isfinite(info2["reward"])


def test_cmaes_core_optimizes_quadratic():
    es = CMAES(np.full(4, 3.0), 1.0, popsize=12, seed=1)
    for _ in range(40):
        X = es.ask()
        es.tell(X, [float(np.sum(x**2)) for x in X])
    assert es.best_f < 1e-2


def test_cmaes_driver_generation(scene):
    drv = CMAESDriver(scene, tot_timestep=2, abs_step=2, pop_size=4, seed=0)
    info = drv.generation()
    assert np.isfinite(info["best_reward"])
    agent = drv.best_agent()
    assert agent.traj.shape == (2, 1, 6)


def test_decode_genome_limits():
    agent = decode_genome(np.full(2 * 6, 10.0), 6, 2, 1)
    # motion limit enforced
    for t in range(1, 6):
        assert agent.calculate_dist(t, 0.015, 0) <= agent.max_moving_dist + 1e-9


def test_param_opt_bouncing():
    sc = bouncing.make(max_newton_iter=4)
    T = 2
    actions = (jnp.zeros((T, 0, 3)), jnp.zeros((T, 0, 3)), jnp.zeros((T, 0)))
    drv = ParamOptDriver(sc, actions, lr=10.0)
    info = drv.iteration()
    assert np.isfinite(info["reward"])
    assert np.isfinite(info["grad"])
    assert info["param"] > 0


def test_rl_env(scene):
    env = Env(scene=scene, time_step=3)
    obs, _ = env.reset()
    assert obs.shape == (env.n_observations,)
    a = np.zeros(env.n_actions, np.float32)
    a[2] = -0.0005
    obs, rew, done, trunc, _ = env.step(a)
    assert np.all(np.isfinite(obs))
    assert np.isfinite(rew)


def test_checkpoint_roundtrip(scene):
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "state.npz")
        checkpoint.save_state(scene.state0, p)
        st = checkpoint.load_state(p)
        np.testing.assert_array_equal(np.asarray(st.pos),
                                      np.asarray(scene.state0.pos))
        np.testing.assert_array_equal(np.asarray(st.gripper.rot),
                                      np.asarray(scene.state0.gripper.rot))


def test_ppo_trainer_smoke(scene):
    from thinshelllab_tpu.train.ppo import PPOTrainer
    from thinshelllab_tpu.train.rl_env import BatchedEnv

    env = BatchedEnv(scene, n_envs=2, time_limit=4)
    tr = PPOTrainer(env, total_steps=16, horizon=4)
    tr.train(verbose=False)
    a = tr.act(env.reset())
    assert a.shape == (2, scene.n_part * 6)
    assert np.all(np.isfinite(a))
