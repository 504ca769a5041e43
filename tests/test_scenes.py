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
