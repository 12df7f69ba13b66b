"""Motion-only pose optimization (the reference's Optimizer::PoseOptimization).

Reference semantics reproduced (Optimizer.cc:233-435):
- 4 outer rounds x 10 LM iterations each;
- after every round, edges are re-classified inlier/outlier at chi2
  5.991 (mono) / 7.815 (stereo); outliers are excluded from the next round
  but re-tested every round (they can come back);
- Huber robust kernel active in rounds 0-1, dropped from round 2 on
  (Optimizer.cc:412: e->setRobustKernel(0));
- per-edge information = invSigma2 of the keypoint's octave;
- returns the optimized pose and the final inlier mask (the caller counts
  inliers, Tracking.cc:770).

TPU design: all edges evaluated dense+masked in one batch; the 6x6 normal
system is a trivial reduce; LM damping with accept/reject is a
``lax.fori_loop``.  No host round-trips inside the step.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import se3
from ..geometry.camera import Camera
from . import residuals as res

N_ROUNDS = 4
N_ITERS = 10


class PoseOptResult(NamedTuple):
    Tcw: jax.Array       # (4, 4) optimized pose
    inlier: jax.Array    # (N,) bool final inlier classification
    n_inliers: jax.Array # () int32
    chi2: jax.Array      # (N,) final per-edge chi2


def _build_normal_eqs(cam, Tcw, pw, obs, inv_sigma2, active, is_stereo, use_huber):
    """Assemble H (6,6), g (6,), total chi2, and per-edge chi2."""
    r_m, pc = res.mono_residual(cam, Tcw, pw, obs[..., :2])
    r_s, _ = res.stereo_residual(cam, Tcw, pw, obs)
    J_pc = res.pc_jacobian_twist(pc)                       # (N,3,6)
    Jm = -res.proj_jacobian_pc(cam, pc) @ J_pc             # (N,2,6)
    Js = -res.stereo_jacobian_pc(cam, pc) @ J_pc           # (N,3,6)

    # chi2 with octave information weight
    chi2_m = jnp.sum(r_m * r_m, axis=-1) * inv_sigma2
    chi2_s = jnp.sum(r_s * r_s, axis=-1) * inv_sigma2
    chi2 = jnp.where(is_stereo, chi2_s, chi2_m)

    # behind-camera edges are dropped this round (g2o marks them outliers
    # implicitly through huge chi2; we gate depth directly)
    pos_depth = pc[..., 2] > 1e-3
    act = active & pos_depth

    if use_huber:
        w_m = res.huber_weight(chi2_m, res.CHI2_MONO)
        w_s = res.huber_weight(chi2_s, res.CHI2_STEREO)
    else:
        w_m = jnp.ones_like(chi2_m)
        w_s = jnp.ones_like(chi2_s)

    wm = jnp.where(act & ~is_stereo, w_m * inv_sigma2, 0.0)
    ws = jnp.where(act & is_stereo, w_s * inv_sigma2, 0.0)

    H = jnp.einsum("nif,n,nig->fg", Jm, wm, Jm) + jnp.einsum(
        "nif,n,nig->fg", Js, ws, Js
    )
    g = jnp.einsum("nif,n,ni->f", Jm, wm, r_m) + jnp.einsum(
        "nif,n,ni->f", Js, ws, r_s
    )
    # robustified total error (what LM accept/reject compares)
    err = jnp.sum(jnp.where(act & ~is_stereo, w_m * chi2_m, 0.0)) + jnp.sum(
        jnp.where(act & is_stereo, w_s * chi2_s, 0.0)
    )
    return H, g, err, chi2, pos_depth


def _lm_rounds(cam, Tcw0, pw, obs, inv_sigma2, valid, is_stereo):
    inlier = valid

    def round_body(rnd, carry):
        Tcw, inlier = carry
        use_huber_round = rnd < 2

        def run_lm(use_huber):
            def iter_body(_, state):
                Tcw, lam, _ = state
                H, g, err, _, _ = _build_normal_eqs(
                    cam, Tcw, pw, obs, inv_sigma2, inlier, is_stereo, use_huber
                )
                Hd = H + lam * jnp.diag(jnp.diag(H)) + 1e-9 * jnp.eye(6)
                # residual convention: r = obs - pred, J = -dpred/dxi
                # normal eqs: H dx = -g... careful with signs:
                # minimizing ||r||: dx = -(JtWJ)^-1 JtW r; our g = JtW r
                dx = -jnp.linalg.solve(Hd, g)
                T_new = se3.exp(dx) @ Tcw
                _, _, err_new, _, _ = _build_normal_eqs(
                    cam, T_new, pw, obs, inv_sigma2, inlier, is_stereo, use_huber
                )
                accept = err_new < err
                Tcw = jnp.where(accept, T_new, Tcw)
                lam = jnp.where(accept, lam * 0.5, lam * 4.0)
                lam = jnp.clip(lam, 1e-10, 1e6)
                return (Tcw, lam, err_new)

            return jax.lax.fori_loop(
                0, N_ITERS, iter_body, (Tcw, jnp.float32(1e-4), jnp.float32(0.0))
            )

        Tcw, _, _ = jax.lax.cond(
            use_huber_round, lambda: run_lm(True), lambda: run_lm(False)
        )
        # re-classify at current pose (chi2 thresholds, Optimizer.cc:389-409)
        _, _, _, chi2, pos_depth = _build_normal_eqs(
            cam, Tcw, pw, obs, inv_sigma2, valid, is_stereo, False
        )
        th = jnp.where(is_stereo, res.CHI2_STEREO, res.CHI2_MONO)
        inlier = valid & (chi2 <= th) & pos_depth
        return (Tcw, inlier)

    Tcw, inlier = jax.lax.fori_loop(0, N_ROUNDS, round_body, (Tcw0, inlier))
    _, _, _, chi2, _ = _build_normal_eqs(
        cam, Tcw, pw, obs, inv_sigma2, valid, is_stereo, False
    )
    return Tcw, inlier, chi2


def optimize_pose(
    cam: Camera,
    Tcw0: jax.Array,
    points_w: jax.Array,
    obs: jax.Array,
    inv_sigma2: jax.Array,
    valid: jax.Array,
    is_stereo: jax.Array,
) -> PoseOptResult:
    """Optimize one camera pose against fixed map points.

    points_w: (N, 3); obs: (N, 3) as (u, v, uR) with uR ignored for mono
    edges; inv_sigma2: (N,) octave information; valid: (N,) edge mask;
    is_stereo: (N,) bool (uR >= 0 in the reference, Optimizer.cc:270).
    """
    Tcw, inlier, chi2 = _lm_rounds(
        cam, Tcw0, points_w, obs, inv_sigma2, valid, is_stereo
    )
    return PoseOptResult(
        Tcw=Tcw,
        inlier=inlier,
        n_inliers=jnp.sum(inlier.astype(jnp.int32)),
        chi2=chi2,
    )
