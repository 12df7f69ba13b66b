"""Schur-complement bundle adjustment (local, global, and init BA).

Replaces g2o's BlockSolver_6_3 + LM pipeline as driven by
Optimizer::BundleAdjustment / LocalBundleAdjustment
(reference: Optimizer.cc:52-231, 437-744).  The reference marginalizes
point blocks (``setMarginalized(true)``) so the linear system reduces to
the camera Schur complement — exactly what is implemented here, in batched
array form:

- observations come per-point in padded slots ``(P, O)`` (the map's natural
  SoA incidence layout), each slot naming its keyframe;
- U (camera diag blocks), V (point 3x3 blocks), W (cam-point coupling) are
  assembled with ``segment_sum`` scatters;
- the camera system ``S = U - W V^-1 W^T`` is built by an unrolled loop
  over slot pairs (static O^2 trip count, no dynamic sparsity);
- S is solved dense per LM iteration (window sizes K <= ~200 keep this in
  the MXU sweet spot), points recovered by back-substitution;
- Huber robustification and per-octave information mirror the reference;
  fixed cameras are masked out of the linear system.

Two-phase outlier schedule (LocalBundleAdjustment, Optimizer.cc:650-694):
``run(...)`` does phase-1 iterations, drops chi2-outlier observations,
phase-2 iterations, and returns the final outlier mask for map writeback.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import se3
from ..geometry.camera import Camera
from . import residuals as res


class BAProblem(NamedTuple):
    """Padded BA problem. K camera slots, P point slots, O obs slots/point."""

    kf_poses: jax.Array      # (K, 4, 4) Tcw
    kf_fixed: jax.Array      # (K,) bool — poses held constant
    kf_valid: jax.Array      # (K,) bool
    points: jax.Array        # (P, 3) world positions
    point_valid: jax.Array   # (P,) bool
    obs_kf: jax.Array        # (P, O) int32 keyframe slot of each obs (-1 pad)
    obs_uvr: jax.Array       # (P, O, 3) measurement (u, v, uR)
    obs_inv_sigma2: jax.Array  # (P, O)
    obs_is_stereo: jax.Array   # (P, O) bool
    obs_valid: jax.Array       # (P, O) bool


class BAResult(NamedTuple):
    kf_poses: jax.Array
    points: jax.Array
    obs_valid: jax.Array     # post-outlier-drop observation mask
    total_chi2: jax.Array


def _edge_terms(cam: Camera, prob: BAProblem, poses, points, use_huber):
    """Residuals/Jacobians/weights for all (P, O) observation slots.

    Returns r (P,O,3), Jc (P,O,3,6), Jp (P,O,3,3), w (P,O,3) row weights
    (information * huber * validity, third row zeroed for mono),
    chi2 (P,O), pos_depth (P,O).
    """
    kf = jnp.clip(prob.obs_kf, 0)
    T = poses[kf]                              # (P, O, 4, 4)
    pw = points[:, None, :]                    # (P, 1, 3)
    pc = se3.transform(T, jnp.broadcast_to(pw, prob.obs_uvr.shape[:2] + (3,)))
    z = pc[..., 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    u = cam.fx * pc[..., 0] / z_safe + cam.cx
    v = cam.fy * pc[..., 1] / z_safe + cam.cy
    ur = u - cam.bf / z_safe
    pred = jnp.stack([u, v, ur], axis=-1)
    r = prob.obs_uvr - pred                    # (P, O, 3)

    Jpc = res.stereo_jacobian_pc(cam, pc)      # (P, O, 3, 3) d(u,v,ur)/dpc
    Jc = -Jpc @ res.pc_jacobian_twist(pc)      # (P, O, 3, 6)
    R = T[..., :3, :3]
    Jp = -Jpc @ R                              # (P, O, 3, 3)

    stereo_row = prob.obs_is_stereo.astype(jnp.float32)
    row_mask = jnp.stack(
        [jnp.ones_like(stereo_row), jnp.ones_like(stereo_row), stereo_row], axis=-1
    )
    chi2 = jnp.sum(r * r * row_mask, axis=-1) * prob.obs_inv_sigma2
    pos_depth = z > 1e-3
    active = prob.obs_valid & (prob.obs_kf >= 0) & prob.point_valid[:, None] & pos_depth

    if use_huber:
        delta2 = jnp.where(prob.obs_is_stereo, res.CHI2_STEREO, res.CHI2_MONO)
        hw = _huber_vec(chi2, delta2)
    else:
        hw = jnp.ones_like(chi2)
    w_scalar = jnp.where(active, hw * prob.obs_inv_sigma2, 0.0)
    w = w_scalar[..., None] * row_mask
    err = jnp.sum(jnp.where(active, hw * chi2, 0.0))
    return r, Jc, Jp, w, chi2, pos_depth, err


def _huber_vec(chi2, delta2):
    e = jnp.maximum(chi2, 1e-12)
    return jnp.where(chi2 <= delta2, 1.0, jnp.sqrt(delta2 / e))


def _lm_step(cam: Camera, prob: BAProblem, poses, points, lam, use_huber):
    """One LM solve: returns (delta_poses applied?, new poses/points, err...)"""
    K = poses.shape[0]
    P, O = prob.obs_kf.shape
    r, Jc, Jp, w, chi2, _, err = _edge_terms(cam, prob, poses, points, use_huber)

    # --- block assembly ---------------------------------------------------
    # V (point blocks) and b_p
    V = jnp.einsum("pori,por,porj->pij", Jp, w, Jp)            # (P, 3, 3)
    b_p = jnp.einsum("pori,por,por->pi", Jp, w, r)             # (P, 3)
    lamV = lam * jax.vmap(jnp.diag)(jax.vmap(jnp.diag)(V)) + 1e-9 * jnp.eye(3)
    V_damp = V + lamV
    # guard singular blocks (unobserved points)
    Vd = V_damp + jnp.where(
        (jnp.abs(jnp.linalg.det(V_damp)) < 1e-12)[:, None, None], jnp.eye(3), 0.0
    )
    V_inv = jnp.linalg.inv(Vd)

    # U (camera blocks) and b_c via scatter over kf index
    kf_flat = jnp.clip(prob.obs_kf, 0).reshape(-1)
    Uc_e = jnp.einsum("pori,por,porj->poij", Jc, w, Jc).reshape(P * O, 6, 6)
    U = jax.ops.segment_sum(Uc_e, kf_flat, num_segments=K)
    bc_e = jnp.einsum("pori,por,por->poi", Jc, w, r).reshape(P * O, 6)
    b_c = jax.ops.segment_sum(bc_e, kf_flat, num_segments=K)

    # W blocks (P, O, 6, 3) and Y = W V^-1
    Wb = jnp.einsum("pori,por,porj->poij", Jc, w, Jp)
    Y = jnp.einsum("poij,pjk->poik", Wb, V_inv)

    # Schur complement S = U - sum_p Y W^T (camera-pair fill-in)
    S = jnp.zeros((K, K, 6, 6), dtype=poses.dtype)
    kf_idx = jnp.clip(prob.obs_kf, 0)
    for o1 in range(O):
        for o2 in range(O):
            contrib = jnp.einsum("pij,pkj->pik", Y[:, o1], Wb[:, o2])  # (P,6,6)
            seg = kf_idx[:, o1] * K + kf_idx[:, o2]
            S = (
                S.reshape(K * K, 6, 6)
                + jax.ops.segment_sum(-contrib, seg, num_segments=K * K)
            ).reshape(K, K, 6, 6)
    # add U on the diagonal + LM damping
    diag_idx = jnp.arange(K)
    lamU = lam * jax.vmap(jnp.diag)(jax.vmap(jnp.diag)(U)) + 1e-9 * jnp.eye(6)
    S = S.at[diag_idx, diag_idx].add(U + lamU)

    # reduced rhs: b_c - sum_o Y b_p
    red_e = jnp.einsum("poij,pj->poi", Y, b_p).reshape(P * O, 6)
    b_red = b_c - jax.ops.segment_sum(red_e, kf_flat, num_segments=K)

    # mask fixed / invalid cameras out of the system
    free = (prob.kf_valid & ~prob.kf_fixed).astype(poses.dtype)
    mask2 = free[:, None] * free[None, :]
    S = S * mask2[:, :, None, None]
    eye6 = jnp.eye(6, dtype=poses.dtype)
    S = S.at[diag_idx, diag_idx].add((1.0 - free)[:, None, None] * eye6)
    b_red = b_red * free[:, None]

    # dense solve of the (6K, 6K) camera system
    S_dense = S.transpose(0, 2, 1, 3).reshape(6 * K, 6 * K)
    # Newton: (H + lam) dx = -g with g = J^T W r and J already = -dpred/dx
    dx_c = -jnp.linalg.solve(S_dense, b_red.reshape(6 * K)).reshape(K, 6)
    dx_c = dx_c * free[:, None]

    # back-substitute points: dx_p = V^-1 (-b_p - W^T dx_c summed over obs)
    dxc_per_obs = dx_c[kf_idx]                                # (P, O, 6)
    # Wb is the (6, 3) cam-point block; W^T dx_c sums over obs and the 6-dim
    wt_dxc = jnp.einsum("poij,poi->pj", Wb, dxc_per_obs)      # (P, 3)
    dx_p = jnp.einsum("pij,pj->pi", V_inv, -(b_p + wt_dxc))
    dx_p = dx_p * prob.point_valid[:, None].astype(poses.dtype)

    new_poses = jax.vmap(lambda d, T: se3.exp(d) @ T)(dx_c, poses)
    new_points = points + dx_p
    return new_poses, new_points, err


def _run_lm(cam, prob, poses, points, n_iters, use_huber):
    def body(_, state):
        poses, points, lam = state
        new_poses, new_points, err_old = _lm_step(
            cam, prob, poses, points, lam, use_huber
        )
        _, _, _, _, _, _, err_new = _edge_terms(
            cam, prob, new_poses, new_points, use_huber
        )
        accept = err_new < err_old
        poses = jnp.where(accept, new_poses, poses)
        points = jnp.where(accept, new_points, points)
        lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0), 1e-10, 1e8)
        return poses, points, lam

    poses, points, _ = jax.lax.fori_loop(
        0, n_iters, body, (poses, points, jnp.float32(1e-4))
    )
    return poses, points


def classify_outliers(cam: Camera, prob: BAProblem, poses, points):
    """chi2/depth gate per observation (Optimizer.cc:660-694)."""
    r, _, _, _, chi2, pos_depth, _ = _edge_terms(
        cam, prob, poses, points, use_huber=False
    )
    th = jnp.where(prob.obs_is_stereo, res.CHI2_STEREO, res.CHI2_MONO)
    ok = (chi2 <= th) & pos_depth
    return prob.obs_valid & ok


def run(
    cam: Camera,
    prob: BAProblem,
    *,
    iters_phase1: int = 5,
    iters_phase2: int = 10,
) -> BAResult:
    """Two-phase BA with the reference's outlier-drop between phases.

    Use iters_phase1=20, iters_phase2=0 for the monocular-init GBA
    (Tracking.cc:618), 10/0 for loop-closing GBA (LoopClosing.cc:622),
    5/10 for local BA (Optimizer.cc:650-693).
    """
    poses, points = prob.kf_poses, prob.points
    poses, points = _run_lm(cam, prob, poses, points, iters_phase1, True)
    if iters_phase2 > 0:
        new_valid = classify_outliers(cam, prob, poses, points)
        prob = prob._replace(obs_valid=new_valid)
        poses, points = _run_lm(cam, prob, poses, points, iters_phase2, True)
    final_valid = classify_outliers(cam, prob, poses, points)
    _, _, _, _, chi2, _, err = _edge_terms(cam, prob, poses, points, False)
    return BAResult(
        kf_poses=poses, points=points, obs_valid=final_valid, total_chi2=err
    )
