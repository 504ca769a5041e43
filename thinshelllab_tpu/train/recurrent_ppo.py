"""Native RecurrentPPO (LSTM policy) for BatchedEnv.

Provides the RecurrentPPO/MlpLstmPolicy option of the reference's SB3
trainer (training/training_env.py:134-151, sb3_contrib branch) as a
from-scratch JAX implementation: a shared LSTM torso with Gaussian policy
and value heads, PPO clipped-surrogate updates with full-sequence BPTT over
each rollout chunk, hidden state carried across steps and reset per-env on
episode end.
"""
from __future__ import annotations

import pickle
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .ppo import _mlp_apply, _mlp_init


class LSTMParams(NamedTuple):
    wi: jnp.ndarray  # (in, 4H)
    wh: jnp.ndarray  # (H, 4H)
    b: jnp.ndarray   # (4H,)


def _lstm_init(key, in_dim, hidden):
    k1, k2 = jax.random.split(key)
    s = 1.0 / np.sqrt(hidden)
    wi = jax.random.uniform(k1, (in_dim, 4 * hidden), minval=-s, maxval=s)
    wh = jax.random.uniform(k2, (hidden, 4 * hidden), minval=-s, maxval=s)
    b = jnp.zeros((4 * hidden,))
    return LSTMParams(wi, wh, b)


def _lstm_step(p: LSTMParams, carry, x):
    h, c = carry
    gates = x @ p.wi + h @ p.wh + p.b
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c = jax.nn.sigmoid(f + 1.0) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h = jax.nn.sigmoid(o) * jnp.tanh(c)
    return (h, c), h


class RPPOState(NamedTuple):
    lstm: LSTMParams
    pi: list
    vf: list
    log_std: jnp.ndarray
    opt_state: optax.OptState


class RecurrentPPOTrainer:
    def __init__(self, env, total_steps=100_000, horizon=64, lr=3e-4,
                 gamma=0.99, lam=0.95, clip=0.2, epochs=4, hidden=64,
                 seed=0, action_scale=1e-3):
        self.env = env
        self.total_steps = total_steps
        self.horizon = horizon
        self.gamma = gamma
        self.lam = lam
        self.clip = clip
        self.epochs = epochs
        self.hidden = hidden
        self.action_scale = action_scale
        obs_dim = env.reset().shape[1]
        act_dim = env.scene.n_part * 6
        self.act_dim = act_dim
        key = jax.random.PRNGKey(seed)
        kl, k1, k2 = jax.random.split(key, 3)
        self.optimizer = optax.adam(lr)
        lstm = _lstm_init(kl, obs_dim, hidden)
        pi = _mlp_init(k1, [hidden, hidden, act_dim])
        vf = _mlp_init(k2, [hidden, 1])
        log_std = jnp.full((act_dim,), -0.5)
        opt_state = self.optimizer.init((lstm, pi, vf, log_std))
        self.state = RPPOState(lstm, pi, vf, log_std, opt_state)
        self.key = key
        self._update = jax.jit(self._update_fn)
        self._fwd_step = jax.jit(self._fwd_step_fn)

    # ----------------------------------------------------------------- core

    def _fwd_step_fn(self, state: RPPOState, obs, carry, key):
        carry, h = _lstm_step(state.lstm, carry, obs)
        mean = _mlp_apply(state.pi, h)
        val = _mlp_apply(state.vf, h)[:, 0]
        noise = jax.random.normal(key, mean.shape)
        act = mean + noise * jnp.exp(state.log_std)
        logp = -0.5 * jnp.sum(
            ((act - mean) / jnp.exp(state.log_std)) ** 2
            + 2 * state.log_std + jnp.log(2 * jnp.pi), axis=-1)
        return carry, act, logp, val

    def _sequence_logp_v(self, params, obs_seq, act_seq, done_seq, carry0):
        """Re-run the LSTM over the (H, N, obs) rollout; hidden resets after
        done steps (matching collection)."""
        lstm, pi, vf, log_std = params

        def scan_fn(carry, inp):
            obs, act, done_prev = inp
            carry = jax.tree.map(
                lambda c: c * (1.0 - done_prev)[:, None], carry)
            carry, h = _lstm_step(lstm, carry, obs)
            mean = _mlp_apply(pi, h)
            v = _mlp_apply(vf, h)[:, 0]
            logp = -0.5 * jnp.sum(
                ((act - mean) / jnp.exp(log_std)) ** 2
                + 2 * log_std + jnp.log(2 * jnp.pi), axis=-1)
            return carry, (logp, v)

        _, (logp, v) = jax.lax.scan(
            scan_fn, carry0, (obs_seq, act_seq, done_seq))
        return logp, v

    def _update_fn(self, state: RPPOState, batch):
        obs, act, adv, ret, logp_old, done_prev, carry0 = batch

        def loss_fn(params):
            logp, v = self._sequence_logp_v(params, obs, act, done_prev,
                                            carry0)
            ratio = jnp.exp(logp - logp_old)
            clipped = jnp.clip(ratio, 1 - self.clip, 1 + self.clip)
            pg = -jnp.mean(jnp.minimum(ratio * adv, clipped * adv))
            vloss = jnp.mean((v - ret) ** 2)
            log_std = params[3]
            ent = jnp.sum(log_std + 0.5 * jnp.log(2 * jnp.pi * jnp.e))
            return pg + 0.5 * vloss - 0.001 * ent

        params = (state.lstm, state.pi, state.vf, state.log_std)
        grads = jax.grad(loss_fn)(params)
        updates, opt_state = self.optimizer.update(grads, state.opt_state,
                                                   params)
        lstm, pi, vf, log_std = optax.apply_updates(params, updates)
        return RPPOState(lstm, pi, vf, log_std, opt_state)

    # ------------------------------------------------------------- training

    def train(self, verbose=True, callback=None):
        """callback(steps_done) fires after every policy update (EvalCallback
        hook parity, reference training_env.py:86)."""
        env = self.env
        obs = env.reset()
        n = env.n
        carry = (jnp.zeros((n, self.hidden)), jnp.zeros((n, self.hidden)))
        done_prev = np.zeros((n,), np.float32)
        steps_done = 0
        while steps_done < self.total_steps:
            traj = {k: [] for k in
                    ("obs", "act", "rew", "val", "logp", "done", "done_prev")}
            carry0 = jax.tree.map(jnp.copy, carry)
            for _ in range(self.horizon):
                carry = jax.tree.map(
                    lambda c: c * (1.0 - jnp.asarray(done_prev))[:, None],
                    carry)
                self.key, k = jax.random.split(self.key)
                o = jnp.asarray(obs)
                carry, act, logp, val = self._fwd_step(self.state, o, carry, k)
                scaled = np.asarray(
                    jnp.clip(act, -1, 1) * self.action_scale, np.float64)
                obs2, rew, done = env.step(scaled)
                for key_, v in (("obs", o), ("act", act), ("rew", rew),
                                ("val", val), ("logp", logp), ("done", done),
                                ("done_prev", done_prev)):
                    traj[key_].append(np.asarray(v))
                obs = obs2
                done_prev = done.astype(np.float32)
                steps_done += n
            rew = np.stack(traj["rew"])
            val = np.stack(traj["val"])
            done_m = np.stack(traj["done"]).astype(rew.dtype)
            adv = np.zeros_like(rew)
            lastgaelam = 0.0
            for t in reversed(range(len(rew))):
                next_val = val[t + 1] if t + 1 < len(rew) else val[t]
                nonterm = 1.0 - done_m[t]
                delta = rew[t] + self.gamma * next_val * nonterm - val[t]
                lastgaelam = delta + self.gamma * self.lam * nonterm * lastgaelam
                adv[t] = lastgaelam
            ret = adv + val
            adv = (adv - adv.mean()) / (adv.std() + 1e-8)
            batch = (
                jnp.asarray(np.stack(traj["obs"])),
                jnp.asarray(np.stack(traj["act"])),
                jnp.asarray(adv), jnp.asarray(ret),
                jnp.asarray(np.stack(traj["logp"])),
                jnp.asarray(np.stack(traj["done_prev"]).astype(np.float32)),
                carry0,
            )
            for _ in range(self.epochs):
                self.state = self._update(self.state, batch)
            if verbose:
                print(f"steps {steps_done}: mean step reward "
                      f"{float(np.mean(rew)):.4f}", flush=True)
            if callback is not None:
                callback(steps_done)
        return self.state

    def act(self, obs, carry=None):
        n = np.asarray(obs).shape[0]
        if carry is None:
            carry = (jnp.zeros((n, self.hidden)),
                     jnp.zeros((n, self.hidden)))
        carry, h = _lstm_step(self.state.lstm, carry, jnp.asarray(obs))
        mean = _mlp_apply(self.state.pi, h)
        return np.asarray(jnp.clip(mean, -1, 1)) * self.action_scale, carry

    def save(self, path):
        with open(path, "wb") as f:
            pickle.dump(jax.tree.map(np.asarray, tuple(self.state[:4])), f)

    def load(self, path):
        with open(path, "rb") as f:
            lstm, pi, vf, log_std = pickle.load(f)
        self.state = self.state._replace(
            lstm=LSTMParams(*map(jnp.asarray, lstm)),
            pi=[tuple(map(jnp.asarray, p)) for p in pi],
            vf=[tuple(map(jnp.asarray, p)) for p in vf],
            log_std=jnp.asarray(log_std))
