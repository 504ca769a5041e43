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


def test_param_cmaes_bouncing():
    # gradient-free system ID (reference run_cmaes_parameter.py), the CLI's
    # `dp --method cmaes` path
    from thinshelllab_tpu.train.dp import ParamCMAESDriver, _get_param

    sc = bouncing.make(max_newton_iter=4)
    T = 2
    actions = (jnp.zeros((T, 0, 3)), jnp.zeros((T, 0, 3)), jnp.zeros((T, 0)))
    base = float(_get_param(jax.tree.map(jnp.asarray, sc.params),
                            sc.sys_param))
    drv = ParamCMAESDriver(sc, actions, base_value=base, scale=10.0,
                           pop_size=4, sigma=1.0, seed=0)
    info = drv.generation()
    assert np.isfinite(info["best_reward"])
    assert info["best_param"] > 0


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


class _BanditEnv:
    """Stateless 6-action bandit with the BatchedEnv interface: reward is
    the (unscaled) first action component, so the optimal policy pushes
    action dim 0 to +1. Cheap learning oracle for the native SAC /
    RecurrentPPO trainers (reference training_env.py:134-151 algo
    branches)."""

    def __init__(self, n=4, obs_dim=3, action_scale=1e-3):
        import types

        self.n = n
        self.obs_dim = obs_dim
        self.scale = action_scale
        self.scene = types.SimpleNamespace(n_part=1)

    def reset(self):
        return np.zeros((self.n, self.obs_dim), np.float32)

    def step(self, act):
        rew = np.asarray(act)[:, 0] / self.scale
        return (np.zeros((self.n, self.obs_dim), np.float32),
                rew.astype(np.float32), np.ones((self.n,), bool))


def test_sac_trainer_smoke(scene):
    from thinshelllab_tpu.train.rl_env import BatchedEnv
    from thinshelllab_tpu.train.sac import SACTrainer

    env = BatchedEnv(scene, n_envs=2, time_limit=4)
    tr = SACTrainer(env, total_steps=8, start_steps=4, batch_size=4,
                    buffer_size=64, hidden=16)
    tr.train(verbose=False)
    a = tr.act(env.reset())
    assert a.shape == (2, scene.n_part * 6)
    assert np.all(np.isfinite(a))


def test_recurrent_ppo_trainer_smoke(scene):
    from thinshelllab_tpu.train.recurrent_ppo import RecurrentPPOTrainer
    from thinshelllab_tpu.train.rl_env import BatchedEnv

    env = BatchedEnv(scene, n_envs=2, time_limit=4)
    tr = RecurrentPPOTrainer(env, total_steps=16, horizon=4, hidden=16)
    tr.train(verbose=False)
    a, carry = tr.act(env.reset())
    assert a.shape == (2, scene.n_part * 6)
    assert np.all(np.isfinite(a))
    assert np.all(np.isfinite(np.asarray(carry[0])))


def test_sac_learns_bandit():
    from thinshelllab_tpu.train.sac import SACTrainer

    env = _BanditEnv(n=4)
    tr = SACTrainer(env, total_steps=1200, start_steps=200, batch_size=64,
                    buffer_size=4096, hidden=32, seed=0)
    tr.train(verbose=False)
    a = tr.act(env.reset()) / tr.action_scale  # unscaled, in [-1, 1]
    assert float(np.mean(a[:, 0])) > 0.3, a[:, 0]


def test_recurrent_ppo_learns_bandit():
    from thinshelllab_tpu.train.recurrent_ppo import RecurrentPPOTrainer

    env = _BanditEnv(n=8)
    tr = RecurrentPPOTrainer(env, total_steps=4096, horizon=16, hidden=32,
                             lr=3e-3, seed=0)
    tr.train(verbose=False)
    a, _ = tr.act(env.reset())
    assert float(np.mean(a[:, 0] / tr.action_scale)) > 0.3, a[:, 0]


def test_rollout_stop_step_matches_serial_replay():
    """CMA-ES early-stop parity (reference run_cmaes_all.py:124-161): the
    tape-based rollout_stop_step must find the same first-bad step as a
    serial per-step check_early_stop replay, on a trajectory engineered to
    trip the force bound mid-rollout (pad driven hard into the table)."""
    from thinshelllab_tpu.engine import stepper
    from thinshelllab_tpu.scenes.base import check_early_stop
    from thinshelllab_tpu.train.cmaes import rollout_stop_step
    from thinshelllab_tpu.core.spec import SimState, GripperState

    sc = folding.make(table_n=4, max_newton_iter=4)
    spec, params = sc.spec, sc.params
    T = 8
    # ram the pad downward: forces blow past 10 N within a few steps
    dpos = np.zeros((T, sc.n_part, 3))
    dpos[:, :, 2] = -2.5e-3
    acts = (jnp.asarray(dpos), jnp.zeros((T, sc.n_part, 3)),
            jnp.zeros((T, sc.n_part)))
    _final, buffers = stepper.simulate(spec, params, sc.state0, acts)

    stop_step, early = rollout_stop_step(spec, params, buffers)
    assert bool(early), "the rammed pad must trip the force bound"
    assert 0 < int(stop_step) < T + 1

    # serial replay: first t (tape index) where check_early_stop fires
    first_bad = None
    for t in range(T + 1):
        st = SimState(
            pos=buffers["pos"][t], vel=buffers["pos"][t] * 0,
            ref_angle=buffers["ref_angle"][t],
            proj_flag=buffers["final_proj_flag"],
            proj_dir=buffers["final_proj_dir"],
            gripper=GripperState(
                pos=buffers["gripper_pos"][t], rot=buffers["gripper_rot"][t],
                dist=buffers["gripper_dist"][t],
                pad_local=buffers["pad_local"][t]))
        if bool(check_early_stop(spec, params, st, frame=t)):
            first_bad = t
            break
    assert first_bad is not None
    assert int(stop_step) == first_bad, (int(stop_step), first_bad)


def test_trajopt_improves_objective():
    """The full differentiable-optimization promise end-to-end: a few Adam
    steps on the waypoint table strictly improve the folding reward
    (reference trajopt_folding.py training loop). lr is the reference's
    3e-5 (run_trajopt_folding.sh)."""
    from thinshelllab_tpu.scenes import folding as folding_mod

    sc = folding_mod.make(table_n=5, max_newton_iter=20)
    d = TrajOptDriver(sc, tot_timestep=6, lr=3e-5)
    hist = d.run(4, verbose=False)
    assert np.isfinite(hist).all()
    assert max(hist) > hist[0] + 0.01, hist
