"""Debug / diagnostic utilities.

check_differential: finite-difference consistency check of the assembled
energy/residual/Hessian at a state (the reference's embedded de-facto unit
test, BaseScene.check_differential:880-974), exposed as a public API and
usable on any scene.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.spec import Params, SceneSpec
from . import elements
from .stepper import build_contacts


def check_differential(spec: SceneSpec, params: Params, state, eps=1e-6,
                       seed=0, verbose=True):
    """Perturb positions by a random unfrozen direction of norm `eps` and
    compare E1-E0 vs F.dx and H dx vs F1-F0. Returns a dict of errors."""
    pos = jnp.asarray(state.pos)
    prev = pos
    vel = jnp.asarray(state.vel)
    ref = jnp.asarray(state.ref_angle)
    contact, _, _ = build_contacts(
        spec, params, pos, prev, jnp.asarray(state.proj_flag),
        jnp.asarray(state.proj_dir),
    )

    def energy(p):
        return elements.total_energy(spec, params, p, prev, vel, ref, contact)

    def residual(p):
        groups = elements.all_groups(spec, params, p, ref, contact,
                                     with_hess=False, spd=False)
        return elements.assemble_residual(spec, groups, p, prev, vel)

    rng = np.random.default_rng(seed)
    dx = rng.standard_normal(pos.shape)
    dx[np.asarray(spec.frozen)] = 0.0
    dx = jnp.asarray(dx * (eps / np.linalg.norm(dx)), pos.dtype)

    # central differences cancel the second-order term (the reference uses
    # forward differences, BaseScene:955, which is noisier on stiff H)
    E0 = float(energy(pos - dx))
    E1 = float(energy(pos + dx))
    F0 = residual(pos - dx)
    F1 = residual(pos + dx)
    Fc = residual(pos)
    dE_pred = 2.0 * float(jnp.sum(Fc * dx))

    groups = elements.all_groups(spec, params, pos, ref, contact,
                                 with_hess=True, spd=False)
    Hdx = 2.0 * elements.hvp(spec, groups, dx)
    dF_true = F1 - F0
    grad_err = abs((E1 - E0) - dE_pred) / max(abs(E1 - E0), 1e-30)
    hess_err = float(jnp.linalg.norm(Hdx - dF_true)
                     / jnp.maximum(jnp.linalg.norm(dF_true), 1e-30))
    out = {
        "dE_fd": E1 - E0,
        "dE_analytic": dE_pred,
        "grad_rel_err": grad_err,
        "hess_rel_err": hess_err,
    }
    if verbose:
        print(f"Gradient Check: dE_fd={E1 - E0:.3e} F.dx={dE_pred:.3e} "
              f"rel={grad_err:.2e}")
        print(f"Hessian Check: |Hdx - dF|/|dF| = {hess_err:.2e}")
    return out
