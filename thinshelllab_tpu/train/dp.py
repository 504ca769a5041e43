"""Differentiable-physics system-parameter optimization ("dp" drivers).

Equivalent of the reference's trajopt_bouncing.py / trajopt_card.py Kb loops
and trajopt_silding.py friction-coefficient loop (and the gradient-free
run_cmaes_parameter.py): roll out a fixed trajectory, backprop the task loss
to a physical parameter through the adjoint's parameter chain, and apply
SGD / CMA-ES updates.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..engine import adjoint, stepper
from ..scenes.base import TaskScene
from .cmaes import CMAES


def _get_param(params, name):
    if name == "kb":
        return params.kb[0]
    if name.startswith("mu_pair:"):
        return params.mu_pairs[int(name.split(":")[1])]
    raise KeyError(name)


def _set_param(params, name, value):
    if name == "kb":
        return params.replace(kb=params.kb.at[0].set(value))
    if name.startswith("mu_pair:"):
        i = int(name.split(":")[1])
        return params.replace(mu_pairs=params.mu_pairs.at[i].set(value))
    raise KeyError(name)


def _param_grad(pgrad, name):
    if name == "kb":
        return float(pgrad.kb[0])
    if name.startswith("mu_pair:"):
        return float(pgrad.mu_pairs[int(name.split(":")[1])])
    raise KeyError(name)


class ParamOptDriver:
    """Gradient descent on one physical parameter with a fixed trajectory."""

    def __init__(self, scene: TaskScene, actions, lr=1.0, param=None,
                 grad_clip=1.0):
        self.scene = scene
        self.actions = actions
        self.lr = lr
        self.param = param or scene.sys_param
        self.grad_clip = grad_clip
        assert self.param is not None
        spec = scene.spec

        def run(params):
            params = jax.tree.map(jnp.asarray, params)
            final, buffers = stepper.simulate(spec, params, scene.state0,
                                              actions)
            reward = scene.reward(buffers)
            seed_pos, seed_ar = scene.seed_loss(buffers)
            res = adjoint.backward(spec, params, buffers, seed_pos, seed_ar,
                                   with_param_grad=True)
            return reward, res.param_grad

        self._run = jax.jit(run)
        self.params = jax.tree.map(jnp.asarray, scene.params)
        self.history = []

    def iteration(self):
        reward, pgrad = self._run(self.params)
        # reference clamps the parameter gradient to +-1
        # (analytic_grad_system setup + trajopt_card.py:108)
        g = float(np.clip(_param_grad(pgrad, self.param), -self.grad_clip,
                          self.grad_clip))
        value = float(_get_param(self.params, self.param)) - self.lr * g
        value = max(value, 1e-4)  # reference run_cmaes_parameter.py:94,97
        self.params = _set_param(self.params, self.param, value)
        self.history.append((float(reward), value, g))
        return {"reward": float(reward), "param": value, "grad": g}


class ParamCMAESDriver:
    """Gradient-free parameter identification (run_cmaes_parameter.py):
    CMA-ES over one scalar physical parameter with a fixed trajectory."""

    def __init__(self, scene: TaskScene, actions, base_value, scale=1.0,
                 param=None, pop_size=8, sigma=1.0, seed=0):
        self.scene = scene
        self.param = param or scene.sys_param
        self.base = base_value
        self.scale = scale
        self.es = CMAES(np.zeros(1), sigma, popsize=pop_size, seed=seed)
        spec = scene.spec

        def run(params):
            _, buffers = stepper.simulate(spec, params, scene.state0, actions)
            return scene.reward(buffers)

        self._run = jax.jit(run)

    def generation(self):
        X = self.es.ask()
        fits = []
        for x in X:
            v = max(1e-4, self.base + float(x[0]) * self.scale)
            params = _set_param(jax.tree.map(jnp.asarray, self.scene.params),
                                self.param, v)
            fits.append(-float(self._run(params)))
        self.es.tell(X, fits)
        best_v = max(1e-4, self.base + float(self.es.best_x[0]) * self.scale)
        return {"best_param": best_v, "best_reward": -self.es.best_f}
