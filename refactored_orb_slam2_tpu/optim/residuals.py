"""Reprojection residuals and analytic Jacobians for SE3 optimization.

These are the edge types of the reference's g2o graphs re-expressed as
batched closed forms: EdgeSE3ProjectXYZOnlyPose / EdgeStereoSE3ProjectXYZ
etc. (g2o types_six_dof_expmap, built by Optimizer.cc:52-231, 233-435).
Twist convention: xi = [rho, phi], left-multiplicative on Tcw
(see geometry.se3).

chi-square gates (95% percentile): 5.991 for 2-DoF mono edges, 7.815 for
3-DoF stereo edges (Optimizer.cc:365-372).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geometry import se3
from ..geometry.camera import Camera

CHI2_MONO = 5.991
CHI2_STEREO = 7.815


def mono_residual(cam: Camera, Tcw: jax.Array, pw: jax.Array, obs: jax.Array):
    """r = obs - project(Tcw * pw).  pw (N,3), obs (N,2) -> (N,2)."""
    pc = se3.transform(Tcw, pw)
    z = pc[..., 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    u = cam.fx * pc[..., 0] / z_safe + cam.cx
    v = cam.fy * pc[..., 1] / z_safe + cam.cy
    r = obs - jnp.stack([u, v], axis=-1)
    return r, pc


def stereo_residual(cam: Camera, Tcw: jax.Array, pw: jax.Array, obs: jax.Array):
    """obs = (u, v, uR); -> residual (N,3)."""
    pc = se3.transform(Tcw, pw)
    z = pc[..., 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    u = cam.fx * pc[..., 0] / z_safe + cam.cx
    v = cam.fy * pc[..., 1] / z_safe + cam.cy
    ur = u - cam.bf / z_safe
    r = obs - jnp.stack([u, v, ur], axis=-1)
    return r, pc


def proj_jacobian_pc(cam: Camera, pc: jax.Array) -> jax.Array:
    """d(u,v)/d pc: (N, 2, 3)."""
    x, y = pc[..., 0], pc[..., 1]
    z = jnp.where(jnp.abs(pc[..., 2]) < 1e-6, 1e-6, pc[..., 2])
    iz = 1.0 / z
    iz2 = iz * iz
    zero = jnp.zeros_like(x)
    row_u = jnp.stack([cam.fx * iz, zero, -cam.fx * x * iz2], axis=-1)
    row_v = jnp.stack([zero, cam.fy * iz, -cam.fy * y * iz2], axis=-1)
    return jnp.stack([row_u, row_v], axis=-2)


def stereo_jacobian_pc(cam: Camera, pc: jax.Array) -> jax.Array:
    """d(u,v,uR)/d pc: (N, 3, 3)."""
    J_uv = proj_jacobian_pc(cam, pc)
    x = pc[..., 0]
    z = jnp.where(jnp.abs(pc[..., 2]) < 1e-6, 1e-6, pc[..., 2])
    iz = 1.0 / z
    iz2 = iz * iz
    zero = jnp.zeros_like(x)
    row_ur = jnp.stack(
        [cam.fx * iz, zero, -cam.fx * x * iz2 + cam.bf * iz2], axis=-1
    )
    return jnp.concatenate([J_uv, row_ur[..., None, :]], axis=-2)


def pc_jacobian_twist(pc: jax.Array) -> jax.Array:
    """d pc / d xi for left-multiplicative twist: [I | -hat(pc)], (N, 3, 6)."""
    eye = jnp.broadcast_to(jnp.eye(3, dtype=pc.dtype), pc.shape[:-1] + (3, 3))
    return jnp.concatenate([eye, -se3.hat(pc)], axis=-1)


def pc_jacobian_point(Tcw: jax.Array, n: int) -> jax.Array:
    """d pc / d pw = R, broadcast to (N, 3, 3)."""
    return jnp.broadcast_to(Tcw[..., :3, :3], (n, 3, 3))


def huber_weight(chi2: jax.Array, delta2: float) -> jax.Array:
    """IRLS weight for the Huber kernel at squared error chi2.

    g2o's RobustKernelHuber with delta: rho'(e) = 1 for e <= delta^2 else
    delta/sqrt(e) (Optimizer.cc:129-131 sets delta = sqrt(5.991)).
    """
    e = jnp.maximum(chi2, 1e-12)
    return jnp.where(chi2 <= delta2, 1.0, jnp.sqrt(delta2 / e))
