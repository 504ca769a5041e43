"""Unit tests of the collision pipeline: point-triangle classification,
projection query, and constraint construction."""
import jax
import jax.numpy as jnp
import numpy as np

from thinshelllab_tpu.ops import collision

RNG = np.random.default_rng(3)


def brute_closest(x, p1, p2, p3, n_samples=400):
    """Monte-Carlo closest distance to the triangle for validation."""
    r = RNG.random((n_samples, 2))
    flip = r.sum(axis=1) > 1
    r[flip] = 1 - r[flip]
    pts = (
        p1[None] * (1 - r[:, 0:1] - r[:, 1:2])
        + p2[None] * r[:, 0:1]
        + p3[None] * r[:, 1:2]
    )
    return np.min(np.linalg.norm(pts - x[None], axis=1))


def test_pt2tri_distance_and_weights():
    # near-surface queries (the regime contact queries live in: the
    # reference's sequential region tests are only trustworthy near the
    # triangle, which is fine under the broadphase distance cutoff)
    for _ in range(30):
        p1, p2, p3 = RNG.standard_normal((3, 3))
        x = (p1 + p2 + p3) / 3 + RNG.standard_normal(3) * 0.3
        case, d, w = collision.pt2tri(
            jnp.asarray(x), jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(p3)
        )
        d = float(d)
        w = np.asarray(w)
        # weights form a point on the triangle (barycentric, sum 1)
        assert abs(w.sum() - 1.0) < 1e-9
        proj = w[0] * p1 + w[1] * p2 + w[2] * p3
        assert abs(np.linalg.norm(x - proj) - d) < 1e-9
        # distance matches brute force to sampling accuracy
        d_mc = brute_closest(x, p1, p2, p3)
        assert d <= d_mc + 1e-9
        assert d >= d_mc - 0.15  # MC upper bound is loose
        # interior case: weights nonnegative
        if int(case) == 0:
            assert w.min() > -1e-9


def test_pt2tri_interior_case():
    p1 = np.array([0.0, 0.0, 0.0])
    p2 = np.array([1.0, 0.0, 0.0])
    p3 = np.array([0.0, 1.0, 0.0])
    x = np.array([0.2, 0.2, 0.5])
    case, d, w = collision.pt2tri(*map(jnp.asarray, (x, p1, p2, p3)))
    assert int(case) == 0
    np.testing.assert_allclose(float(d), 0.5, atol=1e-12)
    np.testing.assert_allclose(np.asarray(w), [0.6, 0.2, 0.2], atol=1e-12)


def test_vertex_case_and_edge_case():
    p1 = np.array([0.0, 0.0, 0.0])
    p2 = np.array([1.0, 0.0, 0.0])
    p3 = np.array([0.0, 1.0, 0.0])
    case, d, w = collision.pt2tri(
        *map(jnp.asarray, (np.array([-1.0, -1.0, 0.0]), p1, p2, p3))
    )
    assert int(case) == 1  # vertex p1
    np.testing.assert_allclose(float(d), np.sqrt(2.0), atol=1e-12)
    case, d, w = collision.pt2tri(
        *map(jnp.asarray, (np.array([0.5, -1.0, 0.0]), p1, p2, p3))
    )
    assert int(case) == -3  # edge 12
    np.testing.assert_allclose(float(d), 1.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(w), [0.5, 0.5, 0.0], atol=1e-12)


def test_contact_constraint_on_folding():
    """Contact analysis on the folding scene: constraints appear when the
    pad is pressed into the cloth, normals point from triangle to vertex
    side, and friction scale k = -mu * k_contact * (gap - eps) >= 0."""
    from thinshelllab_tpu.engine.stepper import build_contacts
    from thinshelllab_tpu.scenes import folding

    from thinshelllab_tpu.engine import stepper

    sc = folding.make(table_n=5, max_newton_iter=5)
    spec, params = sc.spec, sc.params
    # the initial state sits exactly at the eps_contact boundary; press the
    # pad down two steps so constraints activate deterministically
    act2 = (jnp.full((2, 1, 3), 0.0).at[:, :, 2].set(-0.0006),
            jnp.zeros((2, 1, 3)), jnp.zeros((2, 1)))
    st2, _ = stepper.rollout(spec, params, sc.state0, act2)
    pos = st2.pos
    contact, pf, pd = build_contacts(
        spec, params, pos, pos, st2.proj_flag, st2.proj_dir,
    )
    act = np.asarray(contact.active)
    assert act.sum() > 0
    k = np.asarray(contact.k)[act]
    assert np.all(k >= 0)  # mu>0, gap<eps => pressure negative => k positive
    # gap of active constraints is below eps_contact
    idx = np.asarray(contact.idx)[act]
    w = np.asarray(contact.w)[act]
    n = np.asarray(contact.n)[act]
    p = np.asarray(pos)
    xc = np.einsum("ck,cki->ci", w, p[idx[:, :3]])
    gap = np.einsum("ci,ci->c", p[idx[:, 3]] - xc, n)
    assert np.all(gap < spec.eps_contact + 1e-12)


def test_check_differential_utility():
    """Public FD-consistency check (reference check_differential) holds at a
    pressed state of the folding scene."""
    from thinshelllab_tpu.engine import stepper
    from thinshelllab_tpu.engine.debug import check_differential
    from thinshelllab_tpu.scenes import folding

    sc = folding.make(table_n=5, max_newton_iter=5)
    act = (jnp.full((2, 1, 3), 0.0).at[:, :, 2].set(-0.0006),
           jnp.zeros((2, 1, 3)), jnp.zeros((2, 1)))
    st, _ = stepper.rollout(sc.spec, sc.params, sc.state0, act)
    # perturb off equilibrium: at a converged state the residual is ~0 and
    # the FD energy difference is dominated by second-order terms
    rng = np.random.default_rng(1)
    noise = rng.standard_normal(st.pos.shape) * 2e-4
    noise[np.asarray(sc.spec.frozen)] = 0.0
    st = st.replace(pos=st.pos + jnp.asarray(noise))
    out = check_differential(sc.spec, sc.params, st, verbose=False)
    assert out["grad_rel_err"] < 1e-4
    assert out["hess_rel_err"] < 1e-3
