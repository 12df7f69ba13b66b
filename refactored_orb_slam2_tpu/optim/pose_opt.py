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
    """Assemble H (6,6), g (6,), total chi2, and per-edge chi2.

    Fused formulation: one 3-row residual/Jacobian per edge (mono edges zero
    the uR row via row weights and use the 2-DoF chi2), normal equations as
    a single (6, 3N) x (3N, 6) matmul.  ``use_huber`` may be a traced bool.
    """
    n = pw.shape[0]
    r, pc = res.stereo_residual(cam, Tcw, pw, obs)         # (N,3)
    J = -res.stereo_jacobian_pc(cam, pc) @ res.pc_jacobian_twist(pc)  # (N,3,6)

    # chi2 with octave information weight; mono uses only the (u, v) rows
    chi2_m = jnp.sum(r[..., :2] * r[..., :2], axis=-1) * inv_sigma2
    chi2_s = jnp.sum(r * r, axis=-1) * inv_sigma2
    chi2 = jnp.where(is_stereo, chi2_s, chi2_m)

    # behind-camera edges are dropped this round (g2o marks them outliers
    # implicitly through huge chi2; we gate depth directly)
    pos_depth = pc[..., 2] > 1e-3
    act = active & pos_depth

    th = jnp.where(is_stereo, res.CHI2_STEREO, res.CHI2_MONO)
    w_huber = jnp.where(use_huber, res.huber_weight(chi2, th), 1.0)
    w_edge = jnp.where(act, w_huber * inv_sigma2, 0.0)     # (N,)

    # per-row weights: mono edges contribute no uR row
    w_row = w_edge[:, None] * jnp.concatenate(
        [jnp.ones((n, 2), r.dtype), is_stereo[:, None].astype(r.dtype)], axis=1
    )                                                      # (N,3)
    Jf = J.reshape(3 * n, 6)
    wJf = (w_row.reshape(3 * n, 1) * Jf)
    H = Jf.T @ wJf
    g = wJf.T @ r.reshape(3 * n)
    # robustified total error (what LM accept/reject compares)
    err = jnp.sum(jnp.where(act, w_huber * chi2, 0.0))
    return H, g, err, chi2, pos_depth


def _lm_rounds(cam, Tcw0, pw, obs, inv_sigma2, valid, is_stereo):
    """4 rounds x 10 LM iterations with one normal-equation build per
    iteration: the build at the trial pose doubles as the accept check and,
    when accepted, as the next iteration's system (halves the edge work vs
    the textbook two-build loop)."""

    def round_body(rnd, carry):
        Tcw, inlier = carry
        use_huber = rnd < 2

        def iter_body(_, state):
            Tcw, lam, H, g, err = state
            Hd = H + lam * jnp.diag(jnp.diag(H)) + 1e-9 * jnp.eye(6)
            # residual convention: r = obs - pred, J = -dpred/dxi; our
            # g = JtW r so the descent step is dx = -H^-1 g
            dx = -jnp.linalg.solve(Hd, g)
            T_new = se3.exp(dx) @ Tcw
            H_new, g_new, err_new, _, _ = _build_normal_eqs(
                cam, T_new, pw, obs, inv_sigma2, inlier, is_stereo, use_huber
            )
            accept = err_new < err
            pick = lambda a, b: jnp.where(accept, a, b)
            state = (
                pick(T_new, Tcw), jnp.clip(
                    jnp.where(accept, lam * 0.5, lam * 4.0), 1e-10, 1e6
                ),
                pick(H_new, H), pick(g_new, g), pick(err_new, err),
            )
            return state

        H0, g0, err0, _, _ = _build_normal_eqs(
            cam, Tcw, pw, obs, inv_sigma2, inlier, is_stereo, use_huber
        )
        Tcw, _, _, _, _ = jax.lax.fori_loop(
            0, N_ITERS, iter_body, (Tcw, jnp.float32(1e-4), H0, g0, err0)
        )
        # re-classify at current pose (chi2 thresholds, Optimizer.cc:389-409)
        _, _, _, chi2, pos_depth = _build_normal_eqs(
            cam, Tcw, pw, obs, inv_sigma2, valid, is_stereo, False
        )
        th = jnp.where(is_stereo, res.CHI2_STEREO, res.CHI2_MONO)
        inlier = valid & (chi2 <= th) & pos_depth
        return (Tcw, inlier)

    Tcw, inlier = jax.lax.fori_loop(0, N_ROUNDS, round_body, (Tcw0, valid))
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
