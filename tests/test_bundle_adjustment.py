"""BA tests: synthetic multi-view problems with known ground truth."""

import numpy as np
import jax
import jax.numpy as jnp

from refactored_orb_slam2_tpu.geometry import se3
from refactored_orb_slam2_tpu.geometry.camera import Camera
from refactored_orb_slam2_tpu.geometry.triangulation import triangulate_dlt
from refactored_orb_slam2_tpu.optim.bundle_adjustment import BAProblem, run


def make_ba_problem(
    seed=0, n_kf=6, n_pts=120, obs_per_pt=4, noise=0.3, stereo=False,
    pose_noise=0.02, point_noise=0.05, outlier_frac=0.0,
):
    rng = np.random.default_rng(seed)
    cam = Camera.create(500.0, 500.0, 320.0, 240.0, bf=40.0)
    # cameras on a line looking at +z
    poses_true = []
    for k in range(n_kf):
        xi = np.zeros(6, np.float32)
        xi[0] = -0.3 * k          # translate along x
        xi[4] = 0.02 * k          # slight yaw
        poses_true.append(np.asarray(se3.exp(jnp.asarray(xi))))
    poses_true = np.stack(poses_true)
    pts_true = np.stack(
        [rng.uniform(-3, 4, n_pts), rng.uniform(-2, 2, n_pts), rng.uniform(5, 12, n_pts)],
        axis=1,
    ).astype(np.float32)

    O = obs_per_pt
    obs_kf = np.full((n_pts, O), -1, np.int32)
    obs_uvr = np.zeros((n_pts, O, 3), np.float32)
    obs_valid = np.zeros((n_pts, O), bool)
    for p in range(n_pts):
        kfs = rng.choice(n_kf, size=O, replace=False)
        for o, k in enumerate(kfs):
            pc = poses_true[k, :3, :3] @ pts_true[p] + poses_true[k, :3, 3]
            if pc[2] < 0.5:
                continue
            u = 500 * pc[0] / pc[2] + 320 + rng.normal(0, noise)
            v = 500 * pc[1] / pc[2] + 240 + rng.normal(0, noise)
            ur = u - 40.0 / pc[2]
            obs_kf[p, o] = k
            obs_uvr[p, o] = [u, v, ur]
            obs_valid[p, o] = True
    n_out = int(outlier_frac * n_pts)
    out_rows = rng.choice(n_pts, n_out, replace=False)
    for p in out_rows:
        obs_uvr[p, 0, :2] += rng.uniform(20, 50, 2)

    # perturb initial estimates (first pose fixed at truth)
    poses_init = poses_true.copy()
    for k in range(1, n_kf):
        dx = rng.normal(0, pose_noise, 6).astype(np.float32)
        poses_init[k] = np.asarray(se3.exp(jnp.asarray(dx))) @ poses_true[k]
    pts_init = pts_true + rng.normal(0, point_noise, pts_true.shape).astype(np.float32)

    prob = BAProblem(
        kf_poses=jnp.asarray(poses_init),
        kf_fixed=jnp.asarray([True] + [False] * (n_kf - 1)),
        kf_valid=jnp.ones(n_kf, bool),
        points=jnp.asarray(pts_init),
        point_valid=jnp.ones(n_pts, bool),
        obs_kf=jnp.asarray(obs_kf),
        obs_uvr=jnp.asarray(obs_uvr),
        obs_inv_sigma2=jnp.ones((n_pts, O), jnp.float32),
        obs_is_stereo=jnp.full((n_pts, O), stereo),
        obs_valid=jnp.asarray(obs_valid),
    )
    return cam, prob, poses_true, pts_true, out_rows


class TestBA:
    def test_mono_converges(self):
        cam, prob, poses_true, pts_true, _ = make_ba_problem(0)
        result = run(cam, prob, iters_phase1=5, iters_phase2=10)
        pose_err = np.asarray(
            jax.vmap(lambda a, b: se3.log(se3.inv(a) @ b))(
                jnp.asarray(poses_true), result.kf_poses
            )
        )
        # mono BA with one fixed camera has a free scale gauge; ~1e-2 is
        # the noise floor at 0.3 px observation noise
        assert np.abs(pose_err).max() < 2e-2, pose_err.max()
        pt_err = np.linalg.norm(np.asarray(result.points) - pts_true, axis=1)
        assert np.median(pt_err) < 0.05

    def test_stereo_converges(self):
        cam, prob, poses_true, pts_true, _ = make_ba_problem(1, stereo=True)
        result = run(cam, prob, iters_phase1=5, iters_phase2=10)
        pose_err = np.asarray(
            jax.vmap(lambda a, b: se3.log(se3.inv(a) @ b))(
                jnp.asarray(poses_true), result.kf_poses
            )
        )
        assert np.abs(pose_err).max() < 2e-2

    def test_outliers_dropped(self):
        cam, prob, poses_true, pts_true, out_rows = make_ba_problem(
            2, outlier_frac=0.15, noise=0.2
        )
        result = run(cam, prob, iters_phase1=5, iters_phase2=10)
        ov = np.asarray(result.obs_valid)
        # planted outliers (slot 0 of out_rows) should be gone
        assert not ov[out_rows, 0].any()
        # pose accuracy survives outliers
        pose_err = np.asarray(
            jax.vmap(lambda a, b: se3.log(se3.inv(a) @ b))(
                jnp.asarray(poses_true), result.kf_poses
            )
        )
        assert np.abs(pose_err).max() < 2e-2

    def test_fixed_pose_untouched(self):
        cam, prob, poses_true, _, _ = make_ba_problem(3)
        result = run(cam, prob)
        np.testing.assert_allclose(
            np.asarray(result.kf_poses[0]), np.asarray(prob.kf_poses[0]), atol=1e-7
        )

    def test_improves_noisy_points(self):
        """BA must reduce point error vs the noisy initialization."""
        cam, prob, poses_true, pts_true, _ = make_ba_problem(4, point_noise=0.2)
        before = np.linalg.norm(np.asarray(prob.points) - pts_true, axis=1).mean()
        result = run(cam, prob)
        after = np.linalg.norm(np.asarray(result.points) - pts_true, axis=1).mean()
        assert after < before * 0.2, (before, after)


class TestPCGSolver:
    """Matrix-free Schur-PCG path (solver="pcg") vs the dense path."""

    def test_pcg_matches_dense(self):
        cam, prob, poses_true, pts_true, _ = make_ba_problem(5, stereo=True)
        dense = run(cam, prob, iters_phase1=5, iters_phase2=10)
        pcg = run(cam, prob, iters_phase1=5, iters_phase2=10,
                  solver="pcg", n_cg=80)
        # both solvers must land near the same optimum (not identical
        # iterates — PCG is inexact per step, but LM converges)
        err_d = np.asarray(jax.vmap(lambda a, b: se3.log(se3.inv(a) @ b))(
            jnp.asarray(poses_true), dense.kf_poses))
        err_p = np.asarray(jax.vmap(lambda a, b: se3.log(se3.inv(a) @ b))(
            jnp.asarray(poses_true), pcg.kf_poses))
        assert np.abs(err_d).max() < 5e-2, np.abs(err_d).max()
        assert np.abs(err_p).max() < 5e-2, np.abs(err_p).max()
        # and agree with each other
        assert abs(np.abs(err_p).max() - np.abs(err_d).max()) < 2e-2

    def test_pcg_mono_converges(self):
        cam, prob, poses_true, pts_true, _ = make_ba_problem(6)
        result = run(cam, prob, iters_phase1=5, iters_phase2=10,
                     solver="pcg", n_cg=80)
        pose_err = np.asarray(jax.vmap(lambda a, b: se3.log(se3.inv(a) @ b))(
            jnp.asarray(poses_true), result.kf_poses))
        assert np.abs(pose_err).max() < 5e-2
        pt_err = np.linalg.norm(np.asarray(result.points) - pts_true, axis=1)
        assert np.median(pt_err) < 0.08

    def test_pcg_fixed_pose_untouched(self):
        cam, prob, poses_true, _, _ = make_ba_problem(7)
        result = run(cam, prob, solver="pcg", n_cg=40)
        np.testing.assert_allclose(
            np.asarray(result.kf_poses[0]), np.asarray(prob.kf_poses[0]),
            atol=1e-7,
        )


class TestTriangulation:
    def test_dlt_exact(self):
        rng = np.random.default_rng(0)
        T1 = np.eye(4, dtype=np.float32)
        T2 = np.asarray(se3.exp(jnp.asarray([0.5, 0.02, 0.01, 0.0, 0.05, 0.0], jnp.float32)))
        pts = np.stack(
            [rng.uniform(-2, 2, 50), rng.uniform(-1, 1, 50), rng.uniform(3, 9, 50)], axis=1
        ).astype(np.float32)
        def proj(T, p):
            pc = (T[:3, :3] @ p.T).T + T[:3, 3]
            return pc[:, :2] / pc[:, 2:3]
        xn1 = proj(T1, pts)
        xn2 = proj(T2, pts)
        out = triangulate_dlt(
            jnp.asarray(T1[:3]), jnp.asarray(T2[:3]), jnp.asarray(xn1), jnp.asarray(xn2)
        )
        np.testing.assert_allclose(np.asarray(out), pts, rtol=1e-3, atol=1e-3)
