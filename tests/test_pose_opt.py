"""Pose optimization recovers ground-truth camera poses with outliers."""

import numpy as np
import jax
import jax.numpy as jnp

from refactored_orb_slam2_tpu.geometry import se3
from refactored_orb_slam2_tpu.geometry.camera import Camera
from refactored_orb_slam2_tpu.optim.pose_opt import optimize_pose


def make_problem(seed, n=200, noise=0.5, outlier_frac=0.2, stereo=False):
    rng = np.random.default_rng(seed)
    cam = Camera.create(500.0, 500.0, 320.0, 240.0, bf=40.0, width=640, height=480)
    pw = np.stack(
        [rng.uniform(-3, 3, n), rng.uniform(-2, 2, n), rng.uniform(4, 12, n)], axis=1
    ).astype(np.float32)
    xi_true = np.asarray([0.1, -0.05, 0.2, 0.03, -0.02, 0.04], np.float32)
    T_true = se3.exp(jnp.asarray(xi_true))
    pc = np.asarray(se3.transform(T_true, jnp.asarray(pw)))
    u = 500 * pc[:, 0] / pc[:, 2] + 320
    v = 500 * pc[:, 1] / pc[:, 2] + 240
    ur = u - 40.0 / pc[:, 2]
    obs = np.stack([u, v, ur], axis=1)
    obs[:, :2] += rng.normal(0, noise, (n, 2))
    n_out = int(outlier_frac * n)
    out_idx = rng.choice(n, n_out, replace=False)
    obs[out_idx, :2] += rng.uniform(15, 60, (n_out, 2)) * rng.choice([-1, 1], (n_out, 2))
    is_stereo = np.full(n, stereo)
    return cam, T_true, pw, obs.astype(np.float32), is_stereo, out_idx


class TestPoseOpt:
    def _run(self, stereo, seed=0):
        cam, T_true, pw, obs, is_stereo, out_idx = make_problem(seed, stereo=stereo)
        # start from a perturbed pose
        T0 = se3.exp(jnp.asarray([0.05, 0.03, -0.04, 0.02, -0.01, 0.01], jnp.float32)) @ T_true
        run = jax.jit(
            lambda T: optimize_pose(
                cam, T, jnp.asarray(pw), jnp.asarray(obs),
                jnp.ones(len(pw), jnp.float32),
                jnp.ones(len(pw), bool), jnp.asarray(is_stereo),
            )
        )
        result = run(T0)
        err = np.asarray(se3.log(se3.inv(T_true) @ result.Tcw))
        return result, err, out_idx

    def test_mono_recovers_pose(self):
        result, err, out_idx = self._run(stereo=False)
        assert np.abs(err[:3]).max() < 0.01, f"translation err {err[:3]}"
        assert np.abs(err[3:]).max() < 0.005, f"rotation err {err[3:]}"

    def test_stereo_recovers_pose(self):
        result, err, out_idx = self._run(stereo=True)
        assert np.abs(err[:3]).max() < 0.01
        assert np.abs(err[3:]).max() < 0.005

    def test_outlier_classification(self):
        result, _, out_idx = self._run(stereo=False, seed=3)
        inlier = np.asarray(result.inlier)
        # all planted outliers rejected
        assert not inlier[out_idx].any()
        # most true inliers kept
        mask = np.ones(len(inlier), bool)
        mask[out_idx] = False
        assert inlier[mask].mean() > 0.95
        assert int(result.n_inliers) == inlier.sum()

    def test_invalid_edges_ignored(self):
        cam, T_true, pw, obs, is_stereo, _ = make_problem(5)
        valid = np.ones(len(pw), bool)
        # poison half the observations but mark them invalid
        obs2 = obs.copy()
        obs2[::2] = 1e6
        valid[::2] = False
        T0 = se3.exp(jnp.asarray([0.03, 0.0, 0.0, 0.0, 0.01, 0.0], jnp.float32)) @ T_true
        result = optimize_pose(
            cam, T0, jnp.asarray(pw), jnp.asarray(obs2),
            jnp.ones(len(pw), jnp.float32), jnp.asarray(valid),
            jnp.asarray(is_stereo),
        )
        err = np.asarray(se3.log(se3.inv(T_true) @ result.Tcw))
        assert np.abs(err).max() < 0.01
        assert not np.asarray(result.inlier)[::2].any()

    def test_identity_stays_identity(self):
        """Perfect observations from the true pose: optimizer must not move."""
        cam, T_true, pw, obs, is_stereo, _ = make_problem(7, noise=0.0, outlier_frac=0.0)
        result = optimize_pose(
            cam, T_true, jnp.asarray(pw), jnp.asarray(obs),
            jnp.ones(len(pw), jnp.float32), jnp.ones(len(pw), bool),
            jnp.asarray(is_stereo),
        )
        err = np.asarray(se3.log(se3.inv(T_true) @ result.Tcw))
        assert np.abs(err).max() < 1e-3
        assert int(result.n_inliers) == len(pw)
