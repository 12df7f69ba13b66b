"""Pose-graph optimization: loop-closure correction on synthetic graphs."""

import numpy as np
import jax
import jax.numpy as jnp

from refactored_orb_slam2_tpu.geometry import se3, sim3
from refactored_orb_slam2_tpu.optim.pose_graph import (
    PoseGraphEdges, make_edges_from_poses, optimize_pose_graph,
    correct_points_after_pose_graph,
)


def circle_graph(n=24, drift=0.02, scale_drift=0.0, seed=0):
    """Ground truth: keyframes on a circle.  Odometry edges carry the true
    relative poses; the estimated trajectory accumulates drift so the loop
    doesn't close; one loop edge ties last->first with the true relative."""
    rng = np.random.default_rng(seed)
    # ground-truth camera poses S_iw around a circle
    R_gt, t_gt, s_gt = [], [], []
    for k in range(n):
        ang = 2 * np.pi * k / n
        Rw = np.asarray(se3.so3_exp(jnp.asarray([0.0, ang, 0.0], jnp.float32)))
        Cw = np.asarray([5 * np.sin(ang), 0.0, 5 - 5 * np.cos(ang)], np.float32)
        R = Rw.T
        t = -R @ Cw
        R_gt.append(R); t_gt.append(t); s_gt.append(1.0)
    R_gt = np.stack(R_gt); t_gt = np.stack(t_gt); s_gt = np.asarray(s_gt, np.float32)

    # drifted estimates: chain true relatives with noise injected
    R_est = [R_gt[0]]; t_est = [t_gt[0]]; s_est = [1.0]
    for k in range(1, n):
        # true relative S_k,k-1
        Rr = R_gt[k] @ R_gt[k - 1].T
        tr = t_gt[k] - Rr @ t_gt[k - 1]
        noise = rng.normal(0, drift, 3).astype(np.float32)
        Rn = np.asarray(se3.so3_exp(jnp.asarray(noise * 0.3)))
        s_mult = float(np.exp(rng.normal(0, scale_drift)))
        R_new = Rn @ Rr @ R_est[-1]
        t_new = s_mult * (Rn @ (Rr @ t_est[-1] + tr)) + noise * 0.5
        R_est.append(R_new.astype(np.float32))
        t_est.append(t_new.astype(np.float32))
        s_est.append(s_est[-1] * s_mult)
    R_est = np.stack(R_est); t_est = np.stack(t_est)
    s_est = np.asarray(s_est, np.float32)
    return (R_gt, t_gt, s_gt), (R_est, t_est, s_est)


def build_edges(R_gt, t_gt, s_gt, n, extra_loop=True):
    """Odometry edges (k-1 -> k) with TRUE relative measurements + loop edge."""
    ii, jj = [], []
    for k in range(1, n):
        ii.append(k - 1); jj.append(k)
    if extra_loop:
        ii.append(n - 1); jj.append(0)
    i = jnp.asarray(ii, jnp.int32)
    j = jnp.asarray(jj, jnp.int32)
    edges = make_edges_from_poses(
        i, j, jnp.asarray(R_gt), jnp.asarray(t_gt), jnp.asarray(s_gt),
        jnp.ones(len(ii), bool),
    )
    return edges


class TestPoseGraph:
    def test_loop_closure_se3(self):
        n = 24
        (R_gt, t_gt, s_gt), (R_est, t_est, s_est) = circle_graph(n, drift=0.03)
        edges = build_edges(R_gt, t_gt, s_gt, n)
        fixed = jnp.zeros(n, bool).at[0].set(True)
        R, t, s = optimize_pose_graph(
            jnp.asarray(R_est), jnp.asarray(t_est), jnp.ones(n, jnp.float32),
            jnp.ones(n, bool), fixed, edges, fix_scale=True,
        )
        # camera centers should match ground truth
        def centers(Rm, tm, sm):
            return np.stack([
                -(np.asarray(Rm[k]).T @ np.asarray(tm[k])) / np.asarray(sm[k])
                for k in range(n)
            ])
        c_before = centers(R_est, t_est, s_est)
        c_gt = centers(R_gt, t_gt, s_gt)
        c_after = centers(np.asarray(R), np.asarray(t), np.asarray(s))
        err_before = np.linalg.norm(c_before - c_gt, axis=1).max()
        err_after = np.linalg.norm(c_after - c_gt, axis=1).max()
        assert err_after < 0.1 * err_before, (err_before, err_after)
        assert np.allclose(np.asarray(s), 1.0, atol=1e-5)

    def test_loop_closure_sim3_scale_drift(self):
        n = 24
        (R_gt, t_gt, s_gt), (R_est, t_est, s_est) = circle_graph(
            n, drift=0.02, scale_drift=0.02, seed=1
        )
        edges = build_edges(R_gt, t_gt, s_gt, n)
        fixed = jnp.zeros(n, bool).at[0].set(True)
        R, t, s = optimize_pose_graph(
            jnp.asarray(R_est), jnp.asarray(t_est), jnp.asarray(s_est),
            jnp.ones(n, bool), fixed, edges, fix_scale=False,
        )
        # scale drift corrected: all scales ~1
        assert np.abs(np.asarray(s) - 1.0).max() < 0.02, np.asarray(s)

    def test_point_correction(self):
        n = 8
        (R_gt, t_gt, s_gt), (R_est, t_est, s_est) = circle_graph(n, drift=0.05)
        edges = build_edges(R_gt, t_gt, s_gt, n)
        fixed = jnp.zeros(n, bool).at[0].set(True)
        R, t, s = optimize_pose_graph(
            jnp.asarray(R_est), jnp.asarray(t_est), jnp.ones(n, jnp.float32),
            jnp.ones(n, bool), fixed, edges, fix_scale=True,
        )
        # a point at the origin of keyframe k's camera frame must stay at the
        # same camera-frame location after correction
        rng = np.random.default_rng(0)
        pts_cam = rng.uniform(-1, 1, (16, 3)).astype(np.float32) + [0, 0, 3]
        ref = jnp.asarray(rng.integers(0, n, 16), jnp.int32)
        # world position under the drifted estimate
        Rr = np.asarray(R_est)[np.asarray(ref)]
        tr = np.asarray(t_est)[np.asarray(ref)]
        p_world_old = np.einsum("kij,kj->ki", Rr.transpose(0, 2, 1), pts_cam - tr)
        p_new = correct_points_after_pose_graph(
            jnp.asarray(p_world_old), ref,
            jnp.asarray(R_est), jnp.asarray(t_est), jnp.asarray(s_est),
            R, t, s,
        )
        # verify: camera-frame position preserved under new pose
        Rn = np.asarray(R)[np.asarray(ref)]
        tn = np.asarray(t)[np.asarray(ref)]
        p_cam_new = np.einsum("kij,kj->ki", Rn, np.asarray(p_new)) + tn
        np.testing.assert_allclose(p_cam_new, pts_cam, atol=1e-3)


class TestPoseGraphPCG:
    """Matrix-free block-Jacobi PCG solver vs the dense reference solve."""

    def test_pcg_single_step_matches_dense(self):
        """One LM iteration solves one linear system: with enough CG
        iterations the matrix-free solution must match the dense solve."""
        n = 24
        (R_gt, t_gt, s_gt), (R_est, t_est, s_est) = circle_graph(n, drift=0.03)
        edges = build_edges(R_gt, t_gt, s_gt, n)
        fixed = jnp.zeros(n, bool).at[0].set(True)
        for fix_scale, s0 in ((True, jnp.ones(n, jnp.float32)),
                              (False, jnp.asarray(s_est))):
            args = (jnp.asarray(R_est), jnp.asarray(t_est), s0,
                    jnp.ones(n, bool), fixed, edges)
            Rd, td, sd = optimize_pose_graph(
                *args, fix_scale=fix_scale, solver="dense", n_iters=1)
            Rp, tp, sp = optimize_pose_graph(
                *args, fix_scale=fix_scale, solver="pcg", n_iters=1,
                n_cg=7 * n)
            np.testing.assert_allclose(np.asarray(Rp), np.asarray(Rd),
                                       atol=2e-4)
            np.testing.assert_allclose(np.asarray(tp), np.asarray(td),
                                       atol=2e-3)
            np.testing.assert_allclose(np.asarray(sp), np.asarray(sd),
                                       atol=2e-4)

    def test_pcg_matches_dense_sim3(self):
        n = 32
        (R_gt, t_gt, s_gt), (R_est, t_est, s_est) = circle_graph(
            n, drift=0.02, scale_drift=0.02, seed=3
        )
        edges = build_edges(R_gt, t_gt, s_gt, n)
        fixed = jnp.zeros(n, bool).at[0].set(True)
        args = (jnp.asarray(R_est), jnp.asarray(t_est), jnp.asarray(s_est),
                jnp.ones(n, bool), fixed, edges)
        Rp, tp, sp = optimize_pose_graph(*args, fix_scale=False,
                                         solver="pcg", n_cg=n)
        # scale drift corrected through the PCG path too
        assert np.abs(np.asarray(sp) - 1.0).max() < 0.02, np.asarray(sp)

    def test_pcg_large_graph_with_covis_edges(self):
        """Chain + loop + medium-range covisibility edges at K=160 with the
        default n_cg heuristic (max(64, K//4)): loop error must collapse."""
        n = 160
        (R_gt, t_gt, s_gt), (R_est, t_est, s_est) = circle_graph(
            n, drift=0.015, seed=5
        )
        ii = [k - 1 for k in range(1, n)] + [n - 1]
        jj = list(range(1, n)) + [0]
        for k in range(0, n - 4, 2):   # covisibility-style skip edges
            ii.append(k); jj.append(k + 4)
        edges = make_edges_from_poses(
            jnp.asarray(ii, jnp.int32), jnp.asarray(jj, jnp.int32),
            jnp.asarray(R_gt), jnp.asarray(t_gt), jnp.asarray(s_gt),
            jnp.ones(len(ii), bool),
        )
        fixed = jnp.zeros(n, bool).at[0].set(True)
        R, t, s = optimize_pose_graph(
            jnp.asarray(R_est), jnp.asarray(t_est), jnp.ones(n, jnp.float32),
            jnp.ones(n, bool), fixed, edges, fix_scale=True, solver="pcg",
        )

        def centers(Rm, tm, sm):
            Rm, tm, sm = np.asarray(Rm), np.asarray(tm), np.asarray(sm)
            return -np.einsum("kji,kj->ki", Rm, tm) / sm[:, None]

        err_before = np.linalg.norm(
            centers(R_est, t_est, s_est) - centers(R_gt, t_gt, s_gt), axis=1
        ).max()
        err_after = np.linalg.norm(
            centers(R, t, s) - centers(R_gt, t_gt, s_gt), axis=1
        ).max()
        assert err_after < 0.15 * err_before, (err_before, err_after)


class TestOptimizeSim3:
    def test_joint_refinement_recovers_sim3(self):
        from refactored_orb_slam2_tpu.backend.loop_closing import optimize_sim3

        rng = np.random.default_rng(0)
        n = 120
        # ground-truth relative Sim3: p_c = s R p_m + t
        R_gt = np.asarray(se3.so3_exp(jnp.asarray([0.1, -0.3, 0.05], jnp.float32)))
        t_gt = np.asarray([0.6, -0.2, 0.4], np.float32)
        s_gt = 1.25
        p_m = np.stack(
            [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), rng.uniform(3, 9, n)],
            axis=1,
        ).astype(np.float32)
        p_c = s_gt * p_m @ R_gt.T + t_gt
        # noisy observations (normalized, sigma ~ 0.5px at f=500)
        xn_c = p_c[:, :2] / p_c[:, 2:3] + rng.normal(0, 1e-3, (n, 2))
        xn_m = p_m[:, :2] / p_m[:, 2:3] + rng.normal(0, 1e-3, (n, 2))
        # start from a perturbed estimate
        R0 = np.asarray(se3.so3_exp(jnp.asarray([0.05, 0.02, -0.03], jnp.float32))) @ R_gt
        t0 = t_gt + np.asarray([0.1, -0.05, 0.08], np.float32)
        R, t, s, inl = optimize_sim3(
            jnp.asarray(p_c), jnp.asarray(p_m),
            jnp.asarray(xn_c.astype(np.float32)), jnp.asarray(xn_m.astype(np.float32)),
            jnp.ones(n, bool),
            jnp.asarray(R0), jnp.asarray(t0), jnp.asarray(1.1, jnp.float32),
            fix_scale=False, inv_sigma2=500.0**2, chi2_th=10.0,
        )
        cos = (np.trace(np.asarray(R).T @ R_gt) - 1) / 2
        assert np.degrees(np.arccos(np.clip(cos, -1, 1))) < 0.5
        assert abs(float(s) - s_gt) < 0.01
        np.testing.assert_allclose(np.asarray(t), t_gt, atol=0.02)
        assert int(jnp.sum(inl)) > 100
