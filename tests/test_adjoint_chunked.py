"""backward_chunked == backward, bit-exact.

The counterpart of tests/test_stepper_chunked.py for the backward sweep:
the adjoint carry crosses segment boundaries unchanged, so the stitched
gradients must equal the single-scan gradients exactly. Exists because
this image's TPU worker kernel-faults on certain long/large single-program
scans and the 40k-tri bench crash is backward-only (BASELINE.md round-5).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from thinshelllab_tpu.engine import adjoint, stepper
from thinshelllab_tpu.scenes import folding


@pytest.fixture(scope="module")
def tape():
    scene = folding.make(table_n=5, max_newton_iter=4)
    T = 5
    dpos = np.zeros((T, scene.n_part, 3))
    dpos[:, :, 2] = -4e-4
    acts = (jnp.asarray(dpos), jnp.zeros((T, scene.n_part, 3)),
            jnp.zeros((T, scene.n_part)))
    st0 = jax.tree.map(jnp.asarray, scene.state0)
    final, buffers = jax.jit(
        lambda a: stepper.simulate(scene.spec, scene.params, st0, a))(acts)
    seed_pos, seed_ar = scene.seed_loss(buffers)
    return scene, buffers, seed_pos, seed_ar


@pytest.mark.parametrize("comp,param_grad", [(False, False), (True, True)])
def test_chunked_matches_single_scan(tape, comp, param_grad):
    scene, buffers, seed_pos, seed_ar = tape
    kw = dict(with_param_grad=param_grad, compensated=comp)
    r1 = jax.jit(lambda: adjoint.backward(
        scene.spec, scene.params, buffers, seed_pos, seed_ar, **kw))()
    # chunk=2 over T-1=4 backward steps: two equal segments, plus a ragged
    # variant (chunk=3 -> segments of 3 and 1)
    for chunk in (2, 3):
        r2 = adjoint.backward_chunked(
            scene.spec, scene.params, buffers, seed_pos, seed_ar, chunk,
            **kw)
        for a, b in zip(jax.tree.leaves(r1), jax.tree.leaves(r2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_chunked_rejects_bad_chunk(tape):
    scene, buffers, seed_pos, seed_ar = tape
    with pytest.raises(ValueError):
        adjoint.backward_chunked(scene.spec, scene.params, buffers,
                                 seed_pos, seed_ar, 0)
