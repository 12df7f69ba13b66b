"""Tests for the batched RANSAC solvers: two-view init, EPnP, Horn Sim3."""

import numpy as np
import jax
import jax.numpy as jnp

from refactored_orb_slam2_tpu.geometry import se3
from refactored_orb_slam2_tpu.solvers.initializer import initialize_two_view
from refactored_orb_slam2_tpu.solvers.epnp import epnp_ransac, _epnp_single
from refactored_orb_slam2_tpu.solvers.horn_sim3 import horn_sim3, sim3_ransac


def rot_angle(Ra, Rb):
    cos = (np.trace(Ra.T @ Rb) - 1) / 2
    return np.degrees(np.arccos(np.clip(cos, -1, 1)))


class TestTwoViewInit:
    def _make(self, seed=0, planar=False, n=300, noise_px=0.5, outlier_frac=0.1):
        rng = np.random.default_rng(seed)
        if planar:
            pts = np.stack(
                [rng.uniform(-3, 3, n), rng.uniform(-2, 2, n), np.full(n, 6.0)], axis=1
            )
        else:
            pts = np.stack(
                [rng.uniform(-3, 3, n), rng.uniform(-2, 2, n), rng.uniform(4, 12, n)],
                axis=1,
            )
        R = np.asarray(se3.so3_exp(jnp.asarray([0.02, -0.15, 0.01], jnp.float32)))
        t = np.asarray([0.8, 0.05, 0.1], np.float32)
        t = t / np.linalg.norm(t)
        pc2 = pts @ R.T + t
        xn1 = pts[:, :2] / pts[:, 2:3] + rng.normal(0, noise_px / 500.0, (n, 2))
        xn2 = pc2[:, :2] / pc2[:, 2:3] + rng.normal(0, noise_px / 500.0, (n, 2))
        n_out = int(n * outlier_frac)
        out = rng.choice(n, n_out, replace=False)
        xn2[out] += rng.uniform(0.05, 0.3, (n_out, 2))
        return xn1.astype(np.float32), xn2.astype(np.float32), R, t

    def test_general_scene_uses_f(self):
        xn1, xn2, R, t = self._make(0)
        res = initialize_two_view(
            jnp.asarray(xn1), jnp.asarray(xn2), jnp.ones(len(xn1), bool),
            jax.random.PRNGKey(0), sigma_px=1.0, focal=500.0,
        )
        assert bool(res.success)
        assert not bool(res.is_h)
        assert rot_angle(np.asarray(res.R21), R) < 1.0
        # translation up to scale
        tn = np.asarray(res.t21)
        assert np.abs(np.abs(tn @ t) - 1.0) < 0.01
        assert int(res.n_good) > 150

    def test_planar_scene_uses_h(self):
        xn1, xn2, R, t = self._make(1, planar=True)
        res = initialize_two_view(
            jnp.asarray(xn1), jnp.asarray(xn2), jnp.ones(len(xn1), bool),
            jax.random.PRNGKey(1), sigma_px=1.0, focal=500.0,
        )
        assert bool(res.success)
        assert bool(res.is_h)
        assert rot_angle(np.asarray(res.R21), R) < 1.5

    def test_pure_rotation_rejected(self):
        """No parallax -> must not report success."""
        rng = np.random.default_rng(2)
        n = 300
        pts = np.stack(
            [rng.uniform(-3, 3, n), rng.uniform(-2, 2, n), rng.uniform(4, 12, n)], axis=1
        )
        R = np.asarray(se3.so3_exp(jnp.asarray([0.0, -0.1, 0.0], jnp.float32)))
        pc2 = pts @ R.T  # zero translation
        xn1 = (pts[:, :2] / pts[:, 2:3]).astype(np.float32)
        xn2 = (pc2[:, :2] / pc2[:, 2:3]).astype(np.float32)
        res = initialize_two_view(
            jnp.asarray(xn1), jnp.asarray(xn2), jnp.ones(n, bool),
            jax.random.PRNGKey(2), sigma_px=1.0, focal=500.0,
        )
        assert not bool(res.success)


class TestEPnP:
    def _make(self, seed=0, n=150, noise_px=0.5, outlier_frac=0.3):
        rng = np.random.default_rng(seed)
        pw = np.stack(
            [rng.uniform(-3, 3, n), rng.uniform(-2, 2, n), rng.uniform(4, 12, n)], axis=1
        ).astype(np.float32)
        T = np.asarray(
            se3.exp(jnp.asarray([0.3, -0.1, 0.5, 0.1, -0.2, 0.05], jnp.float32))
        )
        pc = pw @ T[:3, :3].T + T[:3, 3]
        xn = pc[:, :2] / pc[:, 2:3] + rng.normal(0, noise_px / 500.0, (n, 2))
        n_out = int(n * outlier_frac)
        out = rng.choice(n, n_out, replace=False)
        xn[out] += rng.uniform(0.03, 0.2, (n_out, 2)) * rng.choice([-1, 1], (n_out, 2))
        return pw, xn.astype(np.float32), T, out

    def test_single_exact(self):
        pw, xn, T, _ = self._make(0, noise_px=0.0, outlier_frac=0.0)
        T_est = np.asarray(_epnp_single(jnp.asarray(pw[:32]), jnp.asarray(xn[:32])))
        err = np.asarray(se3.log(jnp.asarray(np.linalg.inv(T) @ T_est, dtype=jnp.float32)))
        assert np.abs(err).max() < 1e-2

    def test_ransac_with_outliers(self):
        pw, xn, T, out = self._make(1)
        res = epnp_ransac(
            jnp.asarray(pw), jnp.asarray(xn), jnp.ones(len(pw), bool),
            jax.random.PRNGKey(3),
            sigma2=(0.5 / 500.0) ** 2 * 5.991 / 5.991, chi2_th=5.991,
        )
        assert bool(res.success)
        err = np.asarray(
            se3.log(jnp.asarray(np.linalg.inv(T) @ np.asarray(res.Tcw), dtype=jnp.float32))
        )
        assert np.abs(err).max() < 0.05, err
        # planted outliers excluded
        assert np.asarray(res.inliers)[out].mean() < 0.2

    def test_single_near_planar(self):
        """Near-planar world points: the M-matrix null space is genuinely
        multi-dimensional, so the N=1 beta case alone seeds a planar-
        ambiguity minimum — the beta-2/3 approximations must recover the
        true pose (find_betas_approx_2/3, PnPsolver.cc:478-520)."""
        rng = np.random.default_rng(7)
        for trial in range(6):
            n = 32
            pw = np.stack([
                rng.uniform(-3, 3, n), rng.uniform(-2, 2, n),
                8.0 + rng.normal(0, 0.01, n),      # depth spread ~1 cm
            ], axis=1).astype(np.float32)
            tw = rng.normal(0, 0.3, 6).astype(np.float32)
            T = np.asarray(se3.exp(jnp.asarray(tw)))
            pc = pw @ T[:3, :3].T + T[:3, 3]
            assert (pc[:, 2] > 0.5).all()
            xn = (pc[:, :2] / pc[:, 2:3]).astype(np.float32)
            T_est = np.asarray(_epnp_single(jnp.asarray(pw), jnp.asarray(xn)))
            err = np.asarray(se3.log(jnp.asarray(
                np.linalg.inv(T) @ T_est, dtype=jnp.float32)))
            assert np.abs(err).max() < 2e-2, (trial, err)

    def test_ransac_planar_scene(self):
        """Relocalization against a wall/floor-dominated candidate set —
        the reloc envelope the N=1-only solver could not certify."""
        rng = np.random.default_rng(11)
        n = 120
        pw = np.stack([
            rng.uniform(-4, 4, n), rng.uniform(-3, 3, n),
            6.0 + 0.02 * rng.normal(0, 1, n),
        ], axis=1).astype(np.float32)
        T = np.asarray(se3.exp(jnp.asarray(
            [0.2, -0.3, 0.4, 0.15, -0.1, 0.08], jnp.float32)))
        pc = pw @ T[:3, :3].T + T[:3, 3]
        xn = (pc[:, :2] / pc[:, 2:3]
              + rng.normal(0, 0.5 / 500.0, (n, 2))).astype(np.float32)
        res = epnp_ransac(
            jnp.asarray(pw), jnp.asarray(xn), jnp.ones(n, bool),
            jax.random.PRNGKey(5), sigma2=(0.5 / 500.0) ** 2,
            chi2_th=5.991,
        )
        assert bool(res.success)
        err = np.asarray(se3.log(jnp.asarray(
            np.linalg.inv(T) @ np.asarray(res.Tcw), dtype=jnp.float32)))
        assert np.abs(err).max() < 0.05, err

    def test_ransac_deep_perspective(self):
        """Deep-perspective set (depths 2-60 m, strong foreshortening)."""
        rng = np.random.default_rng(13)
        n = 150
        z = rng.uniform(2.0, 60.0, n)
        pw = np.stack([
            rng.uniform(-0.5, 0.5, n) * z, rng.uniform(-0.4, 0.4, n) * z, z,
        ], axis=1).astype(np.float32)
        T = np.asarray(se3.exp(jnp.asarray(
            [0.4, 0.1, -0.3, -0.12, 0.2, 0.05], jnp.float32)))
        pc = pw @ T[:3, :3].T + T[:3, 3]
        keep = pc[:, 2] > 0.5
        pw, pc = pw[keep], pc[keep]
        rngn = rng.normal(0, 0.5 / 500.0, (len(pw), 2))
        xn = (pc[:, :2] / pc[:, 2:3] + rngn).astype(np.float32)
        res = epnp_ransac(
            jnp.asarray(pw), jnp.asarray(xn), jnp.ones(len(pw), bool),
            jax.random.PRNGKey(9), sigma2=(0.5 / 500.0) ** 2,
            chi2_th=5.991,
        )
        assert bool(res.success)
        err = np.asarray(se3.log(jnp.asarray(
            np.linalg.inv(T) @ np.asarray(res.Tcw), dtype=jnp.float32)))
        assert np.abs(err).max() < 0.05, err


class TestHornSim3:
    def test_closed_form(self):
        rng = np.random.default_rng(0)
        p2 = rng.uniform(-2, 2, (3, 3)).astype(np.float32)
        R = np.asarray(se3.so3_exp(jnp.asarray([0.3, -0.2, 0.5], jnp.float32)))
        s, t = 1.7, np.asarray([0.5, -1.0, 2.0], np.float32)
        p1 = s * p2 @ R.T + t
        R_e, t_e, s_e = horn_sim3(jnp.asarray(p1), jnp.asarray(p2), fix_scale=False)
        assert rot_angle(np.asarray(R_e), R) < 0.1
        assert abs(float(s_e) - s) < 1e-3
        np.testing.assert_allclose(np.asarray(t_e), t, atol=1e-3)

    def test_fixed_scale(self):
        rng = np.random.default_rng(1)
        p2 = rng.uniform(-2, 2, (8, 3)).astype(np.float32)
        R = np.asarray(se3.so3_exp(jnp.asarray([0.1, 0.2, -0.1], jnp.float32)))
        t = np.asarray([1.0, 0.0, -0.5], np.float32)
        p1 = p2 @ R.T + t
        R_e, t_e, s_e = horn_sim3(jnp.asarray(p1), jnp.asarray(p2), fix_scale=True)
        assert float(s_e) == 1.0
        assert rot_angle(np.asarray(R_e), R) < 0.1

    def test_ransac(self):
        rng = np.random.default_rng(2)
        n = 120
        p2 = np.stack(
            [rng.uniform(-3, 3, n), rng.uniform(-2, 2, n), rng.uniform(3, 9, n)], axis=1
        ).astype(np.float32)
        R = np.asarray(se3.so3_exp(jnp.asarray([0.05, 0.6, -0.02], jnp.float32)))
        s, t = 1.4, np.asarray([2.0, 0.1, 0.5], np.float32)
        p1 = s * p2 @ R.T + t
        # outliers in 30% of p2
        out = rng.choice(n, 36, replace=False)
        p2_noisy = p2.copy()
        p2_noisy[out] += rng.uniform(0.5, 2.0, (36, 3))
        xn1 = p1[:, :2] / p1[:, 2:3]
        xn2 = p2_noisy[:, :2] / p2_noisy[:, 2:3]
        res = sim3_ransac(
            jnp.asarray(p1), jnp.asarray(p2_noisy), jnp.asarray(xn1), jnp.asarray(xn2),
            jnp.ones(n, bool), jax.random.PRNGKey(4),
            fix_scale=False, chi2_th1=9.21 / 500.0**2, chi2_th2=9.21 / 500.0**2,
        )
        assert bool(res.success)
        assert rot_angle(np.asarray(res.R12), R) < 1.0
        assert abs(float(res.s12) - s) < 0.05
