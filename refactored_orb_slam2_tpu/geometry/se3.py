"""SE(3) Lie-group operations, batched and jit-friendly.

The reference system represents camera poses as OpenCV ``cv::Mat`` 4x4
matrices (``Tcw``, world->camera) and optimizes them through g2o's
``SE3Quat``/``VertexSE3Expmap`` (reference: Source/Libraries/ORB_SLAM2/src/
Converter.cc:36, Optimizer.cc:52-231).  Here poses are plain ``(..., 4, 4)``
float32 arrays and the tangent space is the standard se(3) twist
``xi = [rho(3), phi(3)]`` (translation part first, rotation part second) with
*left*-multiplicative updates ``T <- Exp(xi) @ T`` used by all optimizers.

Everything is shape-polymorphic over leading batch dimensions and safe under
``jax.jit`` / ``jax.vmap`` / autodiff (Taylor fallbacks at small angles).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def hat(phi: jax.Array) -> jax.Array:
    """so(3) hat operator: (..., 3) -> (..., 3, 3) skew-symmetric."""
    x, y, z = phi[..., 0], phi[..., 1], phi[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def vee(Phi: jax.Array) -> jax.Array:
    """Inverse of :func:`hat`: (..., 3, 3) -> (..., 3)."""
    return jnp.stack(
        [Phi[..., 2, 1], Phi[..., 0, 2], Phi[..., 1, 0]], axis=-1
    )


def so3_exp(phi: jax.Array) -> jax.Array:
    """Rodrigues formula: (..., 3) axis-angle -> (..., 3, 3) rotation."""
    theta2 = jnp.sum(phi * phi, axis=-1, keepdims=True)[..., None]
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    small = theta2 < _EPS
    # sin(t)/t and (1-cos(t))/t^2 with Taylor fallbacks.
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    Phi = hat(phi)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), Phi.shape)
    return eye + a * Phi + b * (Phi @ Phi)


def so3_log(R: jax.Array) -> jax.Array:
    """Rotation matrix -> axis-angle, (..., 3, 3) -> (..., 3).

    Goes through the quaternion (Shepperd's branch-free extraction in
    :func:`to_quaternion`) so it is numerically stable for all angles,
    including near pi where the direct trace formula blows up.
    """
    q = to_quaternion(R)
    v, w = q[..., :3], q[..., 3]
    # Make w >= 0 so theta in [0, pi].
    sign = jnp.where(w < 0, -1.0, 1.0)
    v = v * sign[..., None]
    w = w * sign
    vn = jnp.linalg.norm(v, axis=-1)
    theta = 2.0 * jnp.arctan2(vn, w)
    small = vn < 1e-6
    # phi = theta * v / ||v||;  theta/||v|| -> 2/w as theta -> 0.
    scale = jnp.where(small, 2.0 / jnp.maximum(w, 0.5), theta / jnp.where(small, 1.0, vn))
    return v * scale[..., None]


def _left_jacobian(phi: jax.Array) -> jax.Array:
    """SO(3) left Jacobian J_l(phi), (..., 3) -> (..., 3, 3)."""
    theta2 = jnp.sum(phi * phi, axis=-1, keepdims=True)[..., None]
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    small = theta2 < _EPS
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    c = jnp.where(
        small, 1.0 / 6.0 - theta2 / 120.0, (theta - jnp.sin(theta)) / (theta2 * theta)
    )
    Phi = hat(phi)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), Phi.shape)
    return eye + b * Phi + c * (Phi @ Phi)


def _left_jacobian_inv(phi: jax.Array) -> jax.Array:
    theta2 = jnp.sum(phi * phi, axis=-1, keepdims=True)[..., None]
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    small = theta2 < _EPS
    half = theta * 0.5
    cot = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - half * jnp.cos(half) / jnp.where(small, 1.0, jnp.sin(half) + _EPS)) / theta2,
    )
    Phi = hat(phi)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), Phi.shape)
    return eye - 0.5 * Phi + cot * (Phi @ Phi)


def exp(xi: jax.Array) -> jax.Array:
    """se(3) exponential: twist (..., 6) [rho, phi] -> (..., 4, 4)."""
    rho, phi = xi[..., :3], xi[..., 3:]
    R = so3_exp(phi)
    t = jnp.einsum("...ij,...j->...i", _left_jacobian(phi), rho)
    return from_rt(R, t)


def log(T: jax.Array) -> jax.Array:
    """SE(3) log: (..., 4, 4) -> twist (..., 6) [rho, phi]."""
    R, t = T[..., :3, :3], T[..., :3, 3]
    phi = so3_log(R)
    rho = jnp.einsum("...ij,...j->...i", _left_jacobian_inv(phi), t)
    return jnp.concatenate([rho, phi], axis=-1)


def from_rt(R: jax.Array, t: jax.Array) -> jax.Array:
    """Assemble (..., 4, 4) from rotation (..., 3, 3) and translation (..., 3)."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), batch + (4,)
    )[..., None, :]
    return jnp.concatenate([top, bottom], axis=-2)


def inv(T: jax.Array) -> jax.Array:
    """Inverse of a rigid transform (..., 4, 4)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return from_rt(Rt, -jnp.einsum("...ij,...j->...i", Rt, t))


def transform(T: jax.Array, p: jax.Array) -> jax.Array:
    """Apply (..., 4, 4) to points (..., 3)."""
    return jnp.einsum("...ij,...j->...i", T[..., :3, :3], p) + T[..., :3, 3]


def rotation(T: jax.Array) -> jax.Array:
    return T[..., :3, :3]


def translation(T: jax.Array) -> jax.Array:
    return T[..., :3, 3]


def identity(dtype=jnp.float32) -> jax.Array:
    return jnp.eye(4, dtype=dtype)


def normalize(T: jax.Array) -> jax.Array:
    """Re-orthonormalize the rotation block (SVD projection).

    float32 pose chains drift off SO(3); call this after long compositions
    (mirrors the implicit re-normalization g2o gets from quaternion storage).
    """
    R = T[..., :3, :3]
    u, _, vt = jnp.linalg.svd(R)
    det = jnp.linalg.det(u @ vt)
    d = jnp.concatenate(
        [jnp.ones_like(det)[..., None], jnp.ones_like(det)[..., None], det[..., None]],
        axis=-1,
    )
    Rn = u @ (d[..., :, None] * vt)
    return from_rt(Rn, T[..., :3, 3])


def to_quaternion(R: jax.Array) -> jax.Array:
    """Rotation matrix -> quaternion (x, y, z, w), TUM trajectory order.

    Mirrors Converter::toQuaternion used by the trajectory savers
    (reference: System.cc:395-399).  Branch-free Shepperd method.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def case0():  # trace dominant
        s = jnp.sqrt(jnp.maximum(tr + 1.0, _EPS)) * 2.0
        return jnp.stack(
            [(m21 - m12) / s, (m02 - m20) / s, (m10 - m01) / s, 0.25 * s], axis=-1
        )

    def case1():
        s = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, _EPS)) * 2.0
        return jnp.stack(
            [0.25 * s, (m01 + m10) / s, (m02 + m20) / s, (m21 - m12) / s], axis=-1
        )

    def case2():
        s = jnp.sqrt(jnp.maximum(1.0 + m11 - m00 - m22, _EPS)) * 2.0
        return jnp.stack(
            [(m01 + m10) / s, 0.25 * s, (m12 + m21) / s, (m02 - m20) / s], axis=-1
        )

    def case3():
        s = jnp.sqrt(jnp.maximum(1.0 + m22 - m00 - m11, _EPS)) * 2.0
        return jnp.stack(
            [(m02 + m20) / s, (m12 + m21) / s, 0.25 * s, (m10 - m01) / s], axis=-1
        )

    q = jnp.where(
        (tr > 0.0)[..., None],
        case0(),
        jnp.where(
            ((m00 >= m11) & (m00 >= m22))[..., None],
            case1(),
            jnp.where((m11 >= m22)[..., None], case2(), case3()),
        ),
    )
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def from_quaternion(q: jax.Array) -> jax.Array:
    """Quaternion (x, y, z, w) -> rotation matrix (..., 3, 3)."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack(
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], axis=-1
    )
    row1 = jnp.stack(
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], axis=-1
    )
    row2 = jnp.stack(
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], axis=-1
    )
    return jnp.stack([row0, row1, row2], axis=-2)
