"""SB3 interop contract tests.

stable-baselines3 cannot be installed in this image, so the SB3 branch of
`cli.cmd_rl` / `train.rl_env.make_sb3_vec_env` (reference
training/training_env.py:54-96) is exercised against a minimal in-process
stub of the SB3 API surface the code actually uses: `PPO`/`SAC`
(`sb3_contrib.RecurrentPPO`) with `.learn(total_timesteps, callback)` /
`.save(path)`, `common.env_util.make_vec_env`, and
`common.callbacks.EvalCallback`. The stub's vec-env follows SB3's
DummyVecEnv conventions (batched reset/step, auto-reset on done), so the
gymnasium `Env` adapter and the `_sb3_train` wiring are driven end-to-end
with real simulator steps.
"""
import os
import sys
import types

import numpy as np
import pytest

from thinshelllab_tpu import cli
from thinshelllab_tpu.scenes import folding


@pytest.fixture(scope="module")
def scene():
    return folding.make(table_n=5, max_newton_iter=3)


def _install_sb3_stub(monkeypatch, record):
    """Register stub stable_baselines3 / sb3_contrib modules in sys.modules
    implementing exactly the API surface _sb3_train + make_sb3_vec_env use."""

    class _DummyVecEnv:
        # SB3 DummyVecEnv contract: batched reset() -> (N, obs);
        # step(actions) -> (obs, rew, done, infos) with auto-reset on done.
        def __init__(self, fns):
            self.envs = [f() for f in fns]
            self.num_envs = len(self.envs)
            self.action_space = self.envs[0].action_space
            self.observation_space = self.envs[0].observation_space

        def reset(self):
            return np.stack([e.reset()[0] for e in self.envs])

        def step(self, actions):
            obs, rews, dones = [], [], []
            for e, a in zip(self.envs, actions):
                o, r, term, trunc, _info = e.step(a)
                d = bool(term or trunc)
                if d:
                    o = e.reset()[0]
                obs.append(o)
                rews.append(r)
                dones.append(d)
            return (np.stack(obs), np.asarray(rews), np.asarray(dones),
                    [{}] * self.num_envs)

    def make_vec_env(fn, n_envs):
        record["n_envs"] = n_envs
        return _DummyVecEnv([fn] * n_envs)

    class EvalCallback:
        def __init__(self, eval_env, best_model_save_path=None, eval_freq=1,
                     deterministic=True):
            self.eval_env = eval_env
            self.path = best_model_save_path
            record["eval_freq"] = eval_freq

        def run(self, model):
            obs, _ = self.eval_env.reset()
            total = 0.0
            for _ in range(2):
                a = self.eval_env.action_space.sample()
                obs, r, term, trunc, _ = self.eval_env.step(a)
                assert obs.shape == self.eval_env.observation_space.shape
                total += float(r)
                if term or trunc:
                    break
            record["eval_return"] = total
            if self.path:
                model.save(os.path.join(self.path, "best_model"))

    class _Algo:
        def __init__(self, policy, venv, verbose=0):
            record["policy"] = policy
            self.venv = venv

        def learn(self, total_timesteps, callback=None):
            obs = self.venv.reset()
            assert obs.shape == (
                (self.venv.num_envs,) + self.venv.observation_space.shape
            )
            assert obs.dtype == np.float32
            for _ in range(int(total_timesteps)):
                acts = np.stack([self.venv.action_space.sample()
                                 for _ in range(self.venv.num_envs)])
                obs, rews, dones, _ = self.venv.step(acts)
                assert np.all(np.isfinite(rews))
                assert np.all(np.isfinite(obs))
            if callback is not None:
                callback.run(self)
            record["learned"] = int(total_timesteps)

        def save(self, path):
            with open(str(path) + ".stub", "wb") as f:
                f.write(b"sb3-stub")
            record.setdefault("saved", []).append(str(path))

    class PPO(_Algo):
        pass

    class SAC(_Algo):
        pass

    class RecurrentPPO(_Algo):
        pass

    sb3 = types.ModuleType("stable_baselines3")
    common = types.ModuleType("stable_baselines3.common")
    callbacks = types.ModuleType("stable_baselines3.common.callbacks")
    env_util = types.ModuleType("stable_baselines3.common.env_util")
    contrib = types.ModuleType("sb3_contrib")
    sb3.PPO, sb3.SAC, sb3.common = PPO, SAC, common
    callbacks.EvalCallback = EvalCallback
    env_util.make_vec_env = make_vec_env
    common.callbacks, common.env_util = callbacks, env_util
    contrib.RecurrentPPO = RecurrentPPO
    for name, mod in {
        "stable_baselines3": sb3,
        "stable_baselines3.common": common,
        "stable_baselines3.common.callbacks": callbacks,
        "stable_baselines3.common.env_util": env_util,
        "sb3_contrib": contrib,
    }.items():
        monkeypatch.setitem(sys.modules, name, mod)


def _args(scene, tmp_path, **over):
    ns = types.SimpleNamespace(env="folding", tot_step=3, reward_name=None,
                               n_envs=2, timesteps=3,
                               save_dir=str(tmp_path))
    for k, v in over.items():
        setattr(ns, k, v)
    return ns


@pytest.mark.parametrize("algo", ["ppo", "recurrent_ppo"])
def test_sb3_train_contract(monkeypatch, tmp_path, scene, algo):
    """_sb3_train drives the stubbed SB3 through real simulator envs:
    vectorized rollout, eval callback with best-model save, final save."""
    record = {}
    _install_sb3_stub(monkeypatch, record)
    args = _args(scene, tmp_path)
    cli._sb3_train(args, scene, algo, str(tmp_path))

    assert record["n_envs"] == 2
    assert record["learned"] == 3
    assert record["policy"] == (
        "MlpLstmPolicy" if algo == "recurrent_ppo" else "MlpPolicy")
    assert np.isfinite(record["eval_return"])
    assert os.path.exists(os.path.join(str(tmp_path), "best_model.stub"))
    assert os.path.exists(os.path.join(str(tmp_path), "final_model.stub"))


def test_cmd_rl_routes_to_sb3_when_available(monkeypatch, tmp_path, scene):
    """cmd_rl prefers the SB3 path when stable_baselines3 imports
    (reference dependency), falling back to native trainers otherwise."""
    record = {}
    _install_sb3_stub(monkeypatch, record)
    calls = {}
    monkeypatch.setattr(cli, "_make_scene", lambda a: scene)
    monkeypatch.setattr(
        cli, "_sb3_train",
        lambda args, sc, algo, sd: calls.update(algo=algo, save_dir=sd))
    args = _args(scene, tmp_path, algo="sac")
    cli.cmd_rl(args)
    assert calls["algo"] == "sac"
    assert calls["save_dir"] == str(tmp_path)
