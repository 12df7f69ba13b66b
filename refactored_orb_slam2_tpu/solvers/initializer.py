"""Monocular two-view initialization: batched H/F RANSAC + reconstruction.

Replaces Initializer.cc entirely.  The reference runs 200 sequential RANSAC
iterations for a homography and a fundamental matrix in two std::threads
(Initializer.cc:76-119); here *all* hypotheses for *both* models are solved
and scored in one batched program:

- minimal sets drawn with ``jax.random`` (deterministic under a fixed key,
  mirroring the reference's seeded DUtils::Random, Initializer.cc:78);
- 8-point normalized DLT for F and H via batched SVD (ComputeH21/ComputeF21,
  Initializer.cc:218-292);
- symmetric-transfer chi2 scoring of every hypothesis against every
  correspondence as one (hyp, corr) computation (CheckHomography /
  CheckFundamental, Initializer.cc:294-459);
- model selection RH = SH/(SH+SF) > 0.40 (Initializer.cc:110-119);
- reconstruction: F -> E -> 4 (R,t) candidates (ReconstructF,
  Initializer.cc:461-560); H -> Faugeras 8 candidates (ReconstructH,
  Initializer.cc:562-721); cheirality/parallax/reprojection voting via
  batched triangulation (CheckRT, Initializer.cc:785-899).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.triangulation import triangulate_dlt

TH_F = 3.841       # chi2 line-distance gate (Initializer.cc:438)
TH_SCORE = 5.991   # score saturation (both models)
N_HYPS = 200       # reference mMaxIterations (Initializer.cc:40)


class InitResult(NamedTuple):
    success: jax.Array    # () bool
    R21: jax.Array        # (3, 3) rotation cam1 -> cam2
    t21: jax.Array        # (3,) unit-norm translation
    points3d: jax.Array   # (N, 3) triangulated points in cam-1 frame
    is_h: jax.Array       # () bool — homography model chosen
    inliers: jax.Array    # (N,) bool good triangulated correspondences
    n_good: jax.Array     # () int32


def _normalize(pts: jax.Array, valid: jax.Array):
    """Mean/abs-dev normalization (Initializer.cc:739-783)."""
    n = jnp.maximum(jnp.sum(valid), 1)
    mean = jnp.sum(jnp.where(valid[:, None], pts, 0.0), axis=0) / n
    d = jnp.abs(pts - mean)
    mdev = jnp.sum(jnp.where(valid[:, None], d, 0.0), axis=0) / n
    s = 1.0 / jnp.maximum(mdev, 1e-9)
    pn = (pts - mean) * s
    T = jnp.asarray(
        [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]], dtype=pts.dtype
    )
    T = T.at[0, 0].set(s[0]).at[1, 1].set(s[1])
    T = T.at[0, 2].set(-mean[0] * s[0]).at[1, 2].set(-mean[1] * s[1])
    return pn, T


def _solve_h(x1: jax.Array, x2: jax.Array) -> jax.Array:
    """8-point homography DLT: (8, 2) x (8, 2) -> (3, 3)."""
    u1, v1 = x1[:, 0], x1[:, 1]
    u2, v2 = x2[:, 0], x2[:, 1]
    z = jnp.zeros_like(u1)
    o = jnp.ones_like(u1)
    r1 = jnp.stack([z, z, z, -u1, -v1, -o, v2 * u1, v2 * v1, v2], axis=1)
    r2 = jnp.stack([u1, v1, o, z, z, z, -u2 * u1, -u2 * v1, -u2], axis=1)
    A = jnp.concatenate([r1, r2], axis=0)  # (16, 9)
    _, _, vt = jnp.linalg.svd(A)
    return vt[8].reshape(3, 3)


def _solve_f(x1: jax.Array, x2: jax.Array) -> jax.Array:
    """8-point fundamental DLT with rank-2 projection."""
    u1, v1 = x1[:, 0], x1[:, 1]
    u2, v2 = x2[:, 0], x2[:, 1]
    o = jnp.ones_like(u1)
    A = jnp.stack(
        [u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, o], axis=1
    )  # (8, 9)
    _, _, vt = jnp.linalg.svd(A)
    F = vt[8].reshape(3, 3)
    u, s, vt2 = jnp.linalg.svd(F)
    s = s.at[2].set(0.0)
    return u @ jnp.diag(s) @ vt2


def _solve_h_masked(x1: jax.Array, x2: jax.Array, mask: jax.Array) -> jax.Array:
    """Homography DLT over all masked correspondences (rows zeroed out)."""
    u1, v1 = x1[:, 0], x1[:, 1]
    u2, v2 = x2[:, 0], x2[:, 1]
    z = jnp.zeros_like(u1)
    o = jnp.ones_like(u1)
    r1 = jnp.stack([z, z, z, -u1, -v1, -o, v2 * u1, v2 * v1, v2], axis=1)
    r2 = jnp.stack([u1, v1, o, z, z, z, -u2 * u1, -u2 * v1, -u2], axis=1)
    m = mask.astype(x1.dtype)[:, None]
    A = jnp.concatenate([r1 * m, r2 * m], axis=0)
    _, _, vt = jnp.linalg.svd(A, full_matrices=False)
    return vt[8].reshape(3, 3)


def _solve_f_masked(x1: jax.Array, x2: jax.Array, mask: jax.Array) -> jax.Array:
    """Fundamental DLT over all masked correspondences + rank-2 projection."""
    u1, v1 = x1[:, 0], x1[:, 1]
    u2, v2 = x2[:, 0], x2[:, 1]
    o = jnp.ones_like(u1)
    A = jnp.stack(
        [u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, o], axis=1
    ) * mask.astype(x1.dtype)[:, None]
    _, _, vt = jnp.linalg.svd(A, full_matrices=False)
    F = vt[8].reshape(3, 3)
    u, s, vt2 = jnp.linalg.svd(F)
    s = s.at[2].set(0.0)
    return u @ jnp.diag(s) @ vt2


def _score_h(H21, H12, p1, p2, valid, sigma2):
    """Symmetric transfer score (CheckHomography, Initializer.cc:294-364)."""
    def transfer(H, a, b):
        ah = jnp.concatenate([a, jnp.ones_like(a[:, :1])], axis=1)
        bh = ah @ H.T
        w = bh[:, 2]
        w_safe = jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
        proj = bh[:, :2] / w_safe[:, None]
        return jnp.sum((proj - b) ** 2, axis=1)

    chi1 = transfer(H12, p2, p1) / sigma2
    chi2 = transfer(H21, p1, p2) / sigma2
    ok = valid & (chi1 <= TH_SCORE) & (chi2 <= TH_SCORE)
    score = jnp.where(ok, (TH_SCORE - chi1) + (TH_SCORE - chi2), 0.0)
    return jnp.sum(score), ok


def _score_f(F21, p1, p2, valid, sigma2):
    """Epipolar-distance score (CheckFundamental, Initializer.cc:366-459)."""
    p1h = jnp.concatenate([p1, jnp.ones_like(p1[:, :1])], axis=1)
    p2h = jnp.concatenate([p2, jnp.ones_like(p2[:, :1])], axis=1)
    l2 = p1h @ F21.T          # epiline in image 2
    l1 = p2h @ F21             # epiline in image 1
    d2 = jnp.sum(p2h * l2, axis=1) ** 2 / jnp.maximum(
        l2[:, 0] ** 2 + l2[:, 1] ** 2, 1e-12
    )
    d1 = jnp.sum(p1h * l1, axis=1) ** 2 / jnp.maximum(
        l1[:, 0] ** 2 + l1[:, 1] ** 2, 1e-12
    )
    chi1 = d1 / sigma2
    chi2 = d2 / sigma2
    ok = valid & (chi1 <= TH_F) & (chi2 <= TH_F)
    score = jnp.where(ok, (TH_SCORE - chi1) + (TH_SCORE - chi2), 0.0)
    return jnp.sum(score), ok


def _check_rt(R, t, p1, p2, valid, sigma2, th2=4.0 * TH_SCORE / 4.0):
    """Cheirality + parallax + reprojection vote for one (R, t)
    (CheckRT, Initializer.cc:785-899).  Coordinates are normalized, so the
    chi2 gate works on normalized residuals scaled by a nominal focal; we
    use the same 4*sigma2 pixel gate transformed by the caller.
    Returns (n_good, parallax_cos_50th, points3d, good_mask)."""
    P1 = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=1)
    P2 = jnp.concatenate([R, t[:, None]], axis=1)
    p3d = triangulate_dlt(P1, P2, p1, p2)
    finite = jnp.all(jnp.isfinite(p3d), axis=1)
    z1 = p3d[:, 2]
    pc2 = p3d @ R.T + t
    z2 = pc2[:, 2]
    # parallax between rays
    C2 = -R.T @ t
    r1n = jnp.linalg.norm(p3d, axis=1)
    r2 = p3d - C2
    r2n = jnp.linalg.norm(r2, axis=1)
    cosp = jnp.sum(p3d * r2, axis=1) / jnp.maximum(r1n * r2n, 1e-12)
    pos = (z1 > 0) & (z2 > 0)
    # reprojection error in normalized coords
    e1 = jnp.sum((p3d[:, :2] / jnp.where(z1 == 0, 1e-12, z1)[:, None] - p1) ** 2, axis=1)
    e2 = jnp.sum((pc2[:, :2] / jnp.where(z2 == 0, 1e-12, z2)[:, None] - p2) ** 2, axis=1)
    reproj_ok = (e1 <= th2 * sigma2) & (e2 <= th2 * sigma2)
    good = valid & finite & pos & reproj_ok & (cosp < 0.99998)
    n_good = jnp.sum(good.astype(jnp.int32))
    # 50th-smallest parallax cosine among good (reference takes idx 50)
    cos_sorted = jnp.sort(jnp.where(good, cosp, 1.0))
    idx = jnp.minimum(50, jnp.maximum(n_good - 1, 0))
    par_cos = cos_sorted[idx]
    return n_good, par_cos, p3d, good


def initialize_two_view(
    xn1: jax.Array,
    xn2: jax.Array,
    valid: jax.Array,
    key: jax.Array,
    sigma_px: float = 1.0,
    focal: float = 500.0,
) -> InitResult:
    """Two-view bootstrap from matched *normalized* coordinates.

    xn1/xn2: (N, 2) normalized camera coords of the matches in frame 1/2;
    valid: (N,) mask; sigma_px/focal: pixel noise scale mapped into
    normalized units for the chi2 gates.
    """
    n = xn1.shape[0]
    sigma2 = (sigma_px / focal) ** 2

    # --- draw minimal sets -------------------------------------------------
    # sample from valid indices: weighted choice without replacement per hyp
    idx_pool = jnp.arange(n)
    logits = jnp.where(valid, 0.0, -jnp.inf)
    keys = jax.random.split(key, N_HYPS)

    def draw(k):
        return jax.random.choice(k, idx_pool, shape=(8,), replace=False, p=jax.nn.softmax(logits))

    sets = jax.vmap(draw)(keys)                      # (H, 8)

    g1 = xn1[sets]                                   # (H, 8, 2)
    g2 = xn2[sets]

    # --- solve + score both models ----------------------------------------
    # per-model normalization of the full sets (reference normalizes once)
    p1n, T1 = _normalize(xn1, valid)
    p2n, T2 = _normalize(xn2, valid)
    g1n = p1n[sets]
    g2n = p2n[sets]

    H_hyps_n = jax.vmap(_solve_h)(g1n, g2n)
    F_hyps_n = jax.vmap(_solve_f)(g1n, g2n)
    T2inv = jnp.linalg.inv(T2)
    H_hyps = jax.vmap(lambda Hn: T2inv @ Hn @ T1)(H_hyps_n)
    F_hyps = jax.vmap(lambda Fn: T2.T @ Fn @ T1)(F_hyps_n)

    sH, okH = jax.vmap(lambda H: _score_h(H, jnp.linalg.inv(H), xn1, xn2, valid, sigma2))(H_hyps)
    sF, okF = jax.vmap(lambda F: _score_f(F, xn1, xn2, valid, sigma2))(F_hyps)

    bestH = jnp.argmax(sH)
    bestF = jnp.argmax(sF)
    SH = sH[bestH]
    SF = sF[bestF]
    use_h = SH / jnp.maximum(SH + SF, 1e-9) > 0.40

    # refit each model on its full inlier set (masked-row DLT): the
    # minimal-set estimate is too noisy to decompose reliably (the
    # translation direction can be off by several degrees; refit brings the
    # recovered motion to ~0.2 deg / ~0.01 deg-of-arc translation error)
    inliersH0 = okH[bestH]
    inliersF0 = okF[bestF]
    H_n = _solve_h_masked(p1n, p2n, inliersH0)
    F_n2 = _solve_f_masked(p1n, p2n, inliersF0)
    H = T2inv @ H_n @ T1
    F = T2.T @ F_n2 @ T1
    _, inliersH = _score_h(H, jnp.linalg.inv(H), xn1, xn2, valid, sigma2)
    _, inliersF = _score_f(F, xn1, xn2, valid, sigma2)

    # --- reconstruct from F: E = F (normalized coords), 4 candidates ------
    E = F
    u, _, vt = jnp.linalg.svd(E)
    W = jnp.asarray([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    R1 = u @ W @ vt
    R1 = R1 * jnp.sign(jnp.linalg.det(R1))
    R2 = u @ W.T @ vt
    R2 = R2 * jnp.sign(jnp.linalg.det(R2))
    tu = u[:, 2]
    tu = tu / jnp.maximum(jnp.linalg.norm(tu), 1e-12)
    f_cands_R = jnp.stack([R1, R1, R2, R2])
    f_cands_t = jnp.stack([tu, -tu, tu, -tu])

    # --- reconstruct from H: Faugeras decomposition (8 candidates) --------
    h_cands_R, h_cands_t = _decompose_homography(H)

    cand_R = jnp.where(use_h, h_cands_R, jnp.concatenate([f_cands_R, f_cands_R]))
    cand_t = jnp.where(use_h, h_cands_t, jnp.concatenate([f_cands_t, f_cands_t]))
    cand_valid_mask = jnp.where(
        use_h, jnp.ones(8, bool), jnp.asarray([True] * 4 + [False] * 4)
    )
    inliers_model = jnp.where(use_h, inliersH, inliersF)

    n_goods, par_cos, p3ds, goods = jax.vmap(
        lambda R, t: _check_rt(R, t, xn1, xn2, inliers_model, sigma2)
    )(cand_R, cand_t)
    n_goods = jnp.where(cand_valid_mask, n_goods, -1)
    best = jnp.argmax(n_goods)
    n_best = n_goods[best]
    n_inliers = jnp.sum(inliers_model.astype(jnp.int32))
    # acceptance (Initializer.cc:522-559): clear winner, enough points,
    # enough parallax
    second = jnp.sort(n_goods)[-2]
    ok = (
        (n_best > 0.9 * n_inliers.astype(jnp.float32))
        & (second < 0.75 * n_best)
        & (n_best >= 50)
        & (par_cos[best] < 0.9998)
    )
    return InitResult(
        success=ok,
        R21=cand_R[best],
        t21=cand_t[best],
        points3d=p3ds[best],
        is_h=use_h,
        inliers=goods[best],
        n_good=n_best,
    )


def _decompose_homography(H: jax.Array):
    """Faugeras SVD homography decomposition -> 8 (R, t) candidates
    (ReconstructH, Initializer.cc:562-721)."""
    U, w, Vt = jnp.linalg.svd(H)
    s = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    d1, d2, d3 = w[0], w[1], w[2]
    # guard near-degenerate (d1~d2~d3): candidates will fail CheckRT anyway
    aux1 = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) / jnp.maximum(d1 * d1 - d3 * d3, 1e-12), 0.0))
    aux3 = jnp.sqrt(jnp.maximum((d2 * d2 - d3 * d3) / jnp.maximum(d1 * d1 - d3 * d3, 1e-12), 0.0))
    x1s = jnp.asarray([1.0, 1.0, -1.0, -1.0]) * aux1
    x3s = jnp.asarray([1.0, -1.0, 1.0, -1.0]) * aux3

    # case d' > 0
    aux_stheta = jnp.sqrt(
        jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)
    ) / jnp.maximum((d1 + d3) * d2, 1e-12)
    ctheta = (d2 * d2 + d1 * d3) / jnp.maximum((d1 + d3) * d2, 1e-12)
    sthetas = jnp.asarray([1.0, -1.0, -1.0, 1.0]) * aux_stheta

    def rt_pos(i):
        Rp = jnp.eye(3)
        Rp = Rp.at[0, 0].set(ctheta).at[0, 2].set(-sthetas[i])
        Rp = Rp.at[2, 0].set(sthetas[i]).at[2, 2].set(ctheta)
        R = s * U @ Rp @ Vt
        tp = jnp.asarray([x1s[i], 0.0, -x3s[i]]) * (d1 - d3)
        t = U @ tp
        return R, t / jnp.maximum(jnp.linalg.norm(t), 1e-12)

    # case d' < 0
    aux_sphi = jnp.sqrt(
        jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)
    ) / jnp.maximum((d1 - d3) * d2, 1e-12)
    cphi = (d1 * d3 - d2 * d2) / jnp.maximum((d1 - d3) * d2, 1e-12)
    sphis = jnp.asarray([1.0, -1.0, -1.0, 1.0]) * aux_sphi

    def rt_neg(i):
        Rp = -jnp.eye(3)
        Rp = Rp.at[0, 0].set(cphi).at[0, 2].set(sphis[i])
        Rp = Rp.at[1, 1].set(-1.0)
        Rp = Rp.at[2, 0].set(sphis[i]).at[2, 2].set(-cphi)
        R = s * U @ Rp @ Vt
        tp = jnp.asarray([x1s[i], 0.0, x3s[i]]) * (d1 + d3)
        t = U @ tp
        return R, t / jnp.maximum(jnp.linalg.norm(t), 1e-12)

    Rs, ts = [], []
    for i in range(4):
        R, t = rt_pos(i)
        Rs.append(R)
        ts.append(t)
    for i in range(4):
        R, t = rt_neg(i)
        Rs.append(R)
        ts.append(t)
    return jnp.stack(Rs), jnp.stack(ts)
