"""ThinShellLab-TPU: a TPU-native differentiable thin-shell manipulation framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
Genesis-Embodied-AI/ThinShellLab (reference: /root/reference): differentiable
quasi-static implicit FEM for thin shells (cloth/paper) coupled with volumetric
elastic bodies under penalty contact with smoothed Coulomb friction, plus
manipulation task scenes, trajectory optimization, CMA-ES and RL layers.

Design principles (TPU-first):
  * All simulation state lives in flat, statically-shaped jnp arrays (pytrees).
  * Per-element energies are pure functions; forces and element Hessian blocks
    are derived by `jax.grad` / `jax.hessian` and vmapped over element soups.
  * The implicit-Euler incremental potential is minimized by a damped
    line-searched Newton loop under `lax.while_loop` (fully jittable).
  * The linear solve is dense Cholesky/LU for small scenes and matrix-free
    block-Jacobi-preconditioned CG for large ones -- no host round trips.
  * Trajectory gradients use the implicit-function-theorem adjoint (solve
    H z = dL/dx per step), mirroring the reference's hand-written backward
    semantics (damping chain, frozen-DOF gripper grads, friction pressure
    chain, plastic reference-angle chain).
  * Batching: `vmap` over environment batches; scale-out with
    `jax.sharding.Mesh` + `shard_map` (pure data parallel over envs).
"""

from jax import config as _jax_config

# f64 is the reference precision for stiff shell Newton solves; individual
# scenes may build f32 specs for speed (see core.spec.SceneSpec dtype).
_jax_config.update("jax_enable_x64", True)

__version__ = "0.1.0"
