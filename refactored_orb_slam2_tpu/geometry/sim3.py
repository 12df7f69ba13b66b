"""Sim(3) similarity-transform operations (batched, jit-friendly).

The reference uses g2o ``Sim3`` / ``VertexSim3Expmap`` for monocular loop
closure (scale drift correction) — Sim3Solver.cc:216-322 and
Optimizer.cc:763-1043.  A Sim3 element is stored here as a dict-free flat
``(..., 8)`` array ``[q(4: x,y,z,w), t(3), s(1)]``?  No — for simplicity and
speed we carry ``(R, t, s)`` as a tuple of arrays, plus helpers to flatten
into a 4x4 matrix ``[[sR, t], [0, 1]]`` that composes by plain matmul.

Tangent space for optimization: ``zeta = [rho(3), phi(3), sigma(1)]`` with
left-multiplicative updates (scale update is multiplicative: s <- exp(sigma)*s).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import se3


def to_matrix(R: jax.Array, t: jax.Array, s: jax.Array) -> jax.Array:
    """(R, t, s) -> (..., 4, 4) matrix [[sR, t], [0, 1]] (composes by matmul)."""
    return se3.from_rt(R * s[..., None, None], t)


def from_matrix(S: jax.Array):
    """(..., 4, 4) -> (R, t, s).  Scale recovered from row norms of sR."""
    sR = S[..., :3, :3]
    s = jnp.exp(jnp.log(jnp.linalg.det(sR)) / 3.0) if False else _cbrt_det(sR)
    R = sR / s[..., None, None]
    return R, S[..., :3, 3], s


def _cbrt_det(sR: jax.Array) -> jax.Array:
    det = jnp.linalg.det(sR)
    return jnp.cbrt(jnp.maximum(det, 1e-30))


def inverse(R, t, s):
    """Inverse of Sim3: (R, t, s) -> (R', t', s') with S'·S = I."""
    Rt = jnp.swapaxes(R, -1, -2)
    s_inv = 1.0 / s
    t_inv = -s_inv[..., None] * jnp.einsum("...ij,...j->...i", Rt, t)
    return Rt, t_inv, s_inv


def compose(Ra, ta, sa, Rb, tb, sb):
    """S_a ∘ S_b (apply b first)."""
    R = Ra @ Rb
    t = sa[..., None] * jnp.einsum("...ij,...j->...i", Ra, tb) + ta
    return R, t, sa * sb


def apply(R, t, s, p):
    """Map points: s·R·p + t."""
    return s[..., None] * jnp.einsum("...ij,...j->...i", R, p) + t


def exp(zeta: jax.Array):
    """Sim(3) exponential (first-order-coupled form).

    zeta = [rho(3), phi(3), sigma(1)].  Uses the exact W matrix for the
    translation part (Strasdat's thesis eq. for Sim3 exp).
    """
    rho, phi, sigma = zeta[..., :3], zeta[..., 3:6], zeta[..., 6]
    R = se3.so3_exp(phi)
    s = jnp.exp(sigma)
    W = _sim3_W(phi, sigma)
    t = jnp.einsum("...ij,...j->...i", W, rho)
    return R, t, s


def _sim3_W(phi: jax.Array, sigma: jax.Array) -> jax.Array:
    """W matrix of the Sim3 exponential: t = W @ rho.

    W = A·I + B·hat(phi) + C·hat(phi)^2 with the standard (Strasdat) scalar
    coefficients; Taylor fallbacks for small sigma and/or small theta.
    """
    dtype = phi.dtype
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, 1e-16))
    s = jnp.exp(sigma)
    eps = 1e-5
    sig_small = jnp.abs(sigma) < eps
    th_small = theta < eps

    sigma_safe = jnp.where(sig_small, 1.0, sigma)
    theta_safe = jnp.where(th_small, 1.0, theta)

    # C = (s - 1) / sigma,  ->  1 as sigma -> 0
    C = jnp.where(sig_small, 1.0 + sigma / 2.0, (s - 1.0) / sigma_safe)

    sin_t, cos_t = jnp.sin(theta), jnp.cos(theta)

    # General case scalars (both sigma and theta nonzero):
    a = s * sin_t
    b = s * cos_t
    c2 = theta2 + sigma * sigma
    c2_safe = jnp.where(c2 < 1e-16, 1.0, c2)
    A_gen = (a * sigma + (1.0 - b) * theta) / (theta_safe * c2_safe)
    B_gen = (C - ((b - 1.0) * sigma + a * theta) / c2_safe) / jnp.maximum(theta2, 1e-16)

    # sigma -> 0 limits:
    A_sig0 = (1.0 - cos_t) / jnp.maximum(theta2, 1e-16)
    B_sig0 = (theta - sin_t) / jnp.maximum(theta2 * theta_safe, 1e-16)
    # theta -> 0 limits:
    A_th0 = jnp.where(
        sig_small, 0.5 + sigma / 6.0, ((sigma - 1.0) * s + 1.0) / (sigma_safe * sigma_safe)
    )
    B_th0 = jnp.where(
        sig_small,
        1.0 / 6.0,
        (s * (0.5 * sigma * sigma - sigma + 1.0) - 1.0) / (sigma_safe**3),
    )
    A = jnp.where(th_small, A_th0, jnp.where(sig_small, A_sig0, A_gen))
    B = jnp.where(th_small, B_th0, jnp.where(sig_small, B_sig0, B_gen))

    Phi = se3.hat(phi)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), Phi.shape)
    return C[..., None, None] * eye + A[..., None, None] * Phi + B[..., None, None] * (
        Phi @ Phi
    )


def log(R, t, s):
    """Sim(3) log: inverse of :func:`exp`."""
    phi = se3.so3_log(R)
    sigma = jnp.log(s)
    W = _sim3_W(phi, sigma)
    rho = jnp.linalg.solve(W, t[..., None])[..., 0]
    return jnp.concatenate([rho, phi, sigma[..., None]], axis=-1)
