"""simulate_chunked == simulate, bit-exact.

The chunked rollout exists as a workaround for this image's TPU worker
crashing on certain long single-program scans (folding forward at T=50;
PARITY.md known gaps). The scan carry crosses chunk boundaries unchanged,
so the stitched tape must equal the single-scan tape exactly.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from thinshelllab_tpu.engine import stepper
from thinshelllab_tpu.scenes import folding


@pytest.fixture(scope="module")
def scene():
    return folding.make(table_n=5, max_newton_iter=4)


def _actions(T, n_part):
    dpos = np.zeros((T, n_part, 3))
    dpos[:, :, 2] = -4e-4
    return (jnp.asarray(dpos), jnp.zeros((T, n_part, 3)),
            jnp.zeros((T, n_part)))


@pytest.mark.parametrize("save_contacts", [False, True])
def test_chunked_matches_single_scan(scene, save_contacts):
    acts = _actions(4, scene.n_part)
    st0 = jax.tree.map(jnp.asarray, scene.state0)
    f1, b1 = jax.jit(
        lambda a: stepper.simulate(scene.spec, scene.params, st0, a,
                                   save_contacts=save_contacts))(acts)
    f2, b2 = stepper.simulate_chunked(scene.spec, scene.params, st0, acts,
                                      chunk=2, save_contacts=save_contacts)
    l1, l2 = jax.tree.leaves(b1), jax.tree.leaves(b2)
    assert len(l1) == len(l2)
    for a, b in zip(l1, l2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(f1.pos), np.asarray(f2.pos))
    np.testing.assert_array_equal(np.asarray(f1.vel), np.asarray(f2.vel))


def test_chunked_handles_ragged_tail(scene):
    acts = _actions(5, scene.n_part)
    st0 = jax.tree.map(jnp.asarray, scene.state0)
    f1, b1 = jax.jit(
        lambda a: stepper.simulate(scene.spec, scene.params, st0, a))(acts)
    f2, b2 = stepper.simulate_chunked(scene.spec, scene.params, st0, acts,
                                      chunk=2)
    for a, b in zip(jax.tree.leaves(b1), jax.tree.leaves(b2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(f1.pos), np.asarray(f2.pos))
    with pytest.raises(ValueError):
        stepper.simulate_chunked(scene.spec, scene.params, scene.state0,
                                 acts, chunk=0)
