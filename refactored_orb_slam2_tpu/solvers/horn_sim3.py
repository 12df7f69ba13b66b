"""Batched Horn absolute-orientation Sim3 RANSAC for loop alignment.

Replaces Sim3Solver.cc: the closed-form Horn quaternion method on 3-point
minimal sets (ComputeSim3, Sim3Solver.cc:216-322), with optional scale for
monocular, inside a both-direction reprojection-gated RANSAC
(CheckInliers, Sim3Solver.cc:324-344, chi2 9.21 * sigma2).
All hypotheses solved and scored in one batch.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Sim3Result(NamedTuple):
    success: jax.Array
    R12: jax.Array      # (3,3) rotation mapping frame-2 coords into frame-1
    t12: jax.Array      # (3,)
    s12: jax.Array      # ()
    inliers: jax.Array  # (N,) bool
    n_inliers: jax.Array


def horn_sim3(p1: jax.Array, p2: jax.Array, fix_scale: bool):
    """Closed-form Horn alignment of (M, 3) sets: finds (R, t, s) such that
    p1 ~ s * R @ p2 + t."""
    mu1 = p1.mean(axis=0)
    mu2 = p2.mean(axis=0)
    a = p1 - mu1
    b = p2 - mu2
    M = b.T @ a          # (3,3): maps 2 -> 1
    # Horn's 4x4 N matrix from M
    Sxx, Sxy, Sxz = M[0, 0], M[0, 1], M[0, 2]
    Syx, Syy, Syz = M[1, 0], M[1, 1], M[1, 2]
    Szx, Szy, Szz = M[2, 0], M[2, 1], M[2, 2]
    N = jnp.asarray(
        [
            [Sxx + Syy + Szz, Syz - Szy, Szx - Sxz, Sxy - Syx],
            [Syz - Szy, Sxx - Syy - Szz, Sxy + Syx, Szx + Sxz],
            [Szx - Sxz, Sxy + Syx, -Sxx + Syy - Szz, Syz + Szy],
            [Sxy - Syx, Szx + Sxz, Syz + Szy, -Sxx - Syy + Szz],
        ]
    )
    w, v = jnp.linalg.eigh(N)
    q = v[:, 3]  # eigenvector of largest eigenvalue; (w, x, y, z)
    qw, qx, qy, qz = q[0], q[1], q[2], q[3]
    R = jnp.asarray(
        [
            [1 - 2 * (qy * qy + qz * qz), 2 * (qx * qy - qw * qz), 2 * (qx * qz + qw * qy)],
            [2 * (qx * qy + qw * qz), 1 - 2 * (qx * qx + qz * qz), 2 * (qy * qz - qw * qx)],
            [2 * (qx * qz - qw * qy), 2 * (qy * qz + qw * qx), 1 - 2 * (qx * qx + qy * qy)],
        ]
    )
    rb = b @ R.T
    if fix_scale:
        s = jnp.asarray(1.0, dtype=p1.dtype)
    else:
        # Horn symmetric scale: sqrt(sum|a|^2 / sum|b|^2)? reference uses
        # s = D / sum|rb|^2 with D = sum(a . rb) (Sim3Solver.cc:281-296)
        s = jnp.sum(a * rb) / jnp.maximum(jnp.sum(rb * rb), 1e-12)
    t = mu1 - s * (R @ mu2)
    return R, t, s


def horn_sim3_masked(p1: jax.Array, p2: jax.Array, mask: jax.Array,
                     fix_scale: bool):
    """Horn alignment over the masked subset of (N, 3) rows — the jittable
    form of the host-side ``p1[idx]`` refit (static shapes, weight-zeroed
    rows instead of compaction)."""
    w = mask.astype(p1.dtype)
    n = jnp.maximum(jnp.sum(w), 1.0)
    mu1 = jnp.sum(p1 * w[:, None], axis=0) / n
    mu2 = jnp.sum(p2 * w[:, None], axis=0) / n
    a = (p1 - mu1) * w[:, None]
    b = (p2 - mu2) * w[:, None]
    M = b.T @ a
    Sxx, Sxy, Sxz = M[0, 0], M[0, 1], M[0, 2]
    Syx, Syy, Syz = M[1, 0], M[1, 1], M[1, 2]
    Szx, Szy, Szz = M[2, 0], M[2, 1], M[2, 2]
    N = jnp.asarray(
        [
            [Sxx + Syy + Szz, Syz - Szy, Szx - Sxz, Sxy - Syx],
            [Syz - Szy, Sxx - Syy - Szz, Sxy + Syx, Szx + Sxz],
            [Szx - Sxz, Sxy + Syx, -Sxx + Syy - Szz, Syz + Szy],
            [Sxy - Syx, Szx + Sxz, Syz + Szy, -Sxx - Syy + Szz],
        ]
    )
    w_eig, v = jnp.linalg.eigh(N)
    q = v[:, 3]
    qw, qx, qy, qz = q[0], q[1], q[2], q[3]
    R = jnp.asarray(
        [
            [1 - 2 * (qy * qy + qz * qz), 2 * (qx * qy - qw * qz), 2 * (qx * qz + qw * qy)],
            [2 * (qx * qy + qw * qz), 1 - 2 * (qx * qx + qz * qz), 2 * (qy * qz - qw * qx)],
            [2 * (qx * qz - qw * qy), 2 * (qy * qz + qw * qx), 1 - 2 * (qx * qx + qy * qy)],
        ]
    )
    rb = b @ R.T
    if fix_scale:
        s = jnp.asarray(1.0, dtype=p1.dtype)
    else:
        s = jnp.sum(a * rb) / jnp.maximum(jnp.sum(rb * rb), 1e-12)
    t = mu1 - s * (R @ mu2)
    return R, t, s


def sim3_ransac(
    p1: jax.Array,
    p2: jax.Array,
    xn1: jax.Array,
    xn2: jax.Array,
    valid: jax.Array,
    key: jax.Array,
    *,
    fix_scale: bool,
    n_hyps: int = 128,
    chi2_th1: jax.Array | float = 9.21,
    chi2_th2: jax.Array | float = 9.21,
    min_inliers: int = 20,
) -> Sim3Result:
    """RANSAC Horn alignment between matched 3D point sets seen by two
    keyframes.

    p1/p2: (N, 3) camera-frame point positions in KF1/KF2; xn1/xn2: (N, 2)
    normalized image observations in each; chi2 thresholds are already
    scaled by per-point sigma2 (pass arrays for per-point gates like the
    reference's 9.21*sigma2, Sim3Solver.cc:85-86).
    """
    n = p1.shape[0]
    logits = jnp.where(valid, 0.0, -jnp.inf)
    keys = jax.random.split(key, n_hyps)
    idx_pool = jnp.arange(n)

    def draw(k):
        return jax.random.choice(k, idx_pool, shape=(3,), replace=False, p=jax.nn.softmax(logits))

    sets = jax.vmap(draw)(keys)
    Rs, ts, ss = jax.vmap(lambda s_: horn_sim3(p1[s_], p2[s_], fix_scale))(sets)

    def score(R, t, s):
        # project p2 through S12 into camera 1 and compare with xn1;
        # project p1 through S21 into camera 2 and compare with xn2
        p2in1 = s * p2 @ R.T + t
        z1 = p2in1[:, 2]
        ok1 = z1 > 1e-6
        pr1 = p2in1[:, :2] / jnp.where(ok1, z1, 1.0)[:, None]
        e1 = jnp.sum((pr1 - xn1) ** 2, axis=1)
        s21 = 1.0 / jnp.maximum(s, 1e-12)
        p1in2 = s21 * (p1 - t) @ R
        z2 = p1in2[:, 2]
        ok2 = z2 > 1e-6
        pr2 = p1in2[:, :2] / jnp.where(ok2, z2, 1.0)[:, None]
        e2 = jnp.sum((pr2 - xn2) ** 2, axis=1)
        ok = valid & ok1 & ok2 & (e1 <= chi2_th1) & (e2 <= chi2_th2)
        return jnp.sum(ok.astype(jnp.int32)), ok

    n_in, inl = jax.vmap(score)(Rs, ts, ss)
    best = jnp.argmax(n_in)
    return Sim3Result(
        success=n_in[best] >= min_inliers,
        R12=Rs[best],
        t12=ts[best],
        s12=ss[best],
        inliers=inl[best],
        n_inliers=n_in[best],
    )
