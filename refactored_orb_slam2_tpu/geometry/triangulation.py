"""Batched two-view triangulation (linear DLT).

Replaces Initializer::Triangulate (Initializer.cc:723-737) and the
triangulation inside LocalMapping::CreateNewMapPoints
(LocalMapping.cc:296-322).  Solves A p = 0 with A built from two projection
rows per view, via SVD on the 4x4 system — batched over correspondences.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def triangulate_dlt(
    P1: jax.Array, P2: jax.Array, xn1: jax.Array, xn2: jax.Array
) -> jax.Array:
    """Triangulate points from two projection matrices.

    P1, P2: (3, 4) projections (typically K-free: normalized coords with
    P = [R | t]); xn1, xn2: (N, 2) normalized image coords in each view.
    Returns (N, 3) points in the frame P1/P2 project from.
    """
    # Rows: x * P[2] - P[0]; y * P[2] - P[1] for each view.
    a0 = xn1[..., 0:1] * P1[2] - P1[0]
    a1 = xn1[..., 1:2] * P1[2] - P1[1]
    a2 = xn2[..., 0:1] * P2[2] - P2[0]
    a3 = xn2[..., 1:2] * P2[2] - P2[1]
    A = jnp.stack([a0, a1, a2, a3], axis=-2)  # (N, 4, 4)
    # Null vector of A: smallest right singular vector.
    _, _, vt = jnp.linalg.svd(A)
    ph = vt[..., 3, :]
    w = ph[..., 3]
    w_safe = jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
    return ph[..., :3] / w_safe[..., None]


def triangulation_checks(
    p3d: jax.Array,
    T1w: jax.Array,
    T2w: jax.Array,
    xn1: jax.Array,
    xn2: jax.Array,
    sigma2_1: jax.Array,
    sigma2_2: jax.Array,
    fx1: jax.Array,
    fy1: jax.Array,
    fx2: jax.Array,
    fy2: jax.Array,
    min_parallax_cos: float = 0.9998,
    chi2_th: float = 5.991,
):
    """Acceptance gates after triangulation (LocalMapping.cc:326-402).

    p3d in world frame; T1w/T2w world->camera; xn normalized coords.
    Returns bool mask of accepted points.  Checks: finite, positive depth in
    both views, parallax below the cosine bound, reprojection chi2 in both
    views.  (Scale-consistency is applied by the caller who knows octaves.)
    """
    from . import se3

    pc1 = se3.transform(T1w, p3d)
    pc2 = se3.transform(T2w, p3d)
    z1, z2 = pc1[..., 2], pc2[..., 2]

    finite = jnp.all(jnp.isfinite(p3d), axis=-1)
    pos = (z1 > 1e-6) & (z2 > 1e-6)

    # parallax: angle between rays from each camera centre
    C1 = se3.translation(se3.inv(T1w))
    C2 = se3.translation(se3.inv(T2w))
    r1 = p3d - C1
    r2 = p3d - C2
    cosp = jnp.sum(r1 * r2, axis=-1) / (
        jnp.linalg.norm(r1, axis=-1) * jnp.linalg.norm(r2, axis=-1) + 1e-12
    )
    parallax_ok = cosp < min_parallax_cos

    z1s = jnp.where(pos, z1, 1.0)
    z2s = jnp.where(pos, z2, 1.0)
    e1 = (pc1[..., :2] / z1s[..., None] - xn1)
    e2 = (pc2[..., :2] / z2s[..., None] - xn2)
    chi1 = ((e1[..., 0] * fx1) ** 2 + (e1[..., 1] * fy1) ** 2) / sigma2_1
    chi2 = ((e2[..., 0] * fx2) ** 2 + (e2[..., 1] * fy2) ** 2) / sigma2_2
    reproj_ok = (chi1 <= chi2_th) & (chi2 <= chi2_th)

    return finite & pos & parallax_ok & reproj_ok
