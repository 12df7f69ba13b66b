"""Unit tests for SE3/Sim3 Lie ops and the camera model.

Oracles: scipy.spatial.transform for rotations, cv2 for undistortion —
used only to validate, never at runtime.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation as Rsp

from refactored_orb_slam2_tpu.geometry import se3, sim3, camera as cam_mod


def random_rotvecs(n, rng, scale=2.0):
    return rng.standard_normal((n, 3)) * scale


class TestSO3:
    def test_exp_matches_scipy(self):
        rng = np.random.default_rng(0)
        phi = random_rotvecs(64, rng).astype(np.float32)
        R = np.asarray(se3.so3_exp(jnp.asarray(phi)))
        R_ref = Rsp.from_rotvec(phi).as_matrix()
        np.testing.assert_allclose(R, R_ref, atol=2e-5)

    def test_log_roundtrip(self):
        rng = np.random.default_rng(1)
        phi = random_rotvecs(64, rng, scale=1.0).astype(np.float32)
        # log() returns the minimal-angle representative; keep ||phi|| < pi.
        n = np.linalg.norm(phi, axis=1, keepdims=True)
        phi = np.where(n > 3.0, phi * (3.0 / n), phi).astype(np.float32)
        R = se3.so3_exp(jnp.asarray(phi))
        phi2 = np.asarray(se3.so3_log(R))
        np.testing.assert_allclose(phi2, phi, atol=1e-4)

    def test_log_small_angle(self):
        phi = jnp.asarray([[1e-6, -2e-6, 3e-7], [0.0, 0.0, 0.0]], dtype=jnp.float32)
        R = se3.so3_exp(phi)
        np.testing.assert_allclose(np.asarray(se3.so3_log(R)), np.asarray(phi), atol=1e-6)


class TestSE3:
    def test_exp_log_roundtrip(self):
        rng = np.random.default_rng(2)
        xi = np.concatenate(
            [rng.standard_normal((32, 3)), random_rotvecs(32, rng, 1.0)], axis=1
        ).astype(np.float32)
        T = se3.exp(jnp.asarray(xi))
        xi2 = np.asarray(se3.log(T))
        np.testing.assert_allclose(xi2, xi, atol=5e-4)

    def test_inv_compose(self):
        rng = np.random.default_rng(3)
        xi = rng.standard_normal((8, 6)).astype(np.float32)
        T = se3.exp(jnp.asarray(xi))
        eye = np.asarray(T @ se3.inv(T))
        np.testing.assert_allclose(eye, np.broadcast_to(np.eye(4), (8, 4, 4)), atol=1e-5)

    def test_transform_points(self):
        T = se3.exp(jnp.asarray([0.1, -0.2, 0.3, 0.2, 0.1, -0.1], dtype=jnp.float32))
        p = jnp.asarray([[1.0, 2.0, 3.0]])
        out = se3.transform(T, p)
        ref = (np.asarray(T)[:3, :3] @ np.asarray(p).T).T + np.asarray(T)[:3, 3]
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)

    def test_quaternion_roundtrip(self):
        rng = np.random.default_rng(4)
        phi = random_rotvecs(64, rng, 2.5).astype(np.float32)
        R = se3.so3_exp(jnp.asarray(phi))
        q = se3.to_quaternion(R)
        q_ref = Rsp.from_matrix(np.asarray(R)).as_quat()  # (x,y,z,w)
        # quaternions are sign-ambiguous
        dot = np.abs(np.sum(np.asarray(q) * q_ref, axis=1))
        np.testing.assert_allclose(dot, 1.0, atol=1e-4)
        R2 = se3.from_quaternion(q)
        np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)


class TestSim3:
    def test_compose_apply(self):
        rng = np.random.default_rng(5)
        Ra = se3.so3_exp(jnp.asarray(rng.standard_normal(3).astype(np.float32)))
        Rb = se3.so3_exp(jnp.asarray(rng.standard_normal(3).astype(np.float32)))
        ta = jnp.asarray(rng.standard_normal(3).astype(np.float32))
        tb = jnp.asarray(rng.standard_normal(3).astype(np.float32))
        sa = jnp.asarray(1.5, dtype=jnp.float32)
        sb = jnp.asarray(0.7, dtype=jnp.float32)
        p = jnp.asarray(rng.standard_normal((10, 3)).astype(np.float32))
        Rc, tc, sc = sim3.compose(Ra, ta, sa, Rb, tb, sb)
        lhs = sim3.apply(Rc, tc, sc, p)
        rhs = sim3.apply(Ra, ta, sa, sim3.apply(Rb, tb, sb, p))
        np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), rtol=1e-4, atol=1e-4)

    def test_inverse(self):
        rng = np.random.default_rng(6)
        R = se3.so3_exp(jnp.asarray(rng.standard_normal(3).astype(np.float32)))
        t = jnp.asarray(rng.standard_normal(3).astype(np.float32))
        s = jnp.asarray(2.3, dtype=jnp.float32)
        Ri, ti, si = sim3.inverse(R, t, s)
        p = jnp.asarray(rng.standard_normal((5, 3)).astype(np.float32))
        back = sim3.apply(Ri, ti, si, sim3.apply(R, t, s, p))
        np.testing.assert_allclose(np.asarray(back), np.asarray(p), rtol=1e-4, atol=1e-4)

    def test_exp_log_roundtrip(self):
        rng = np.random.default_rng(7)
        zeta = np.concatenate(
            [rng.standard_normal((16, 3)),
             rng.standard_normal((16, 3)) * 0.8,
             rng.standard_normal((16, 1)) * 0.4],
            axis=1,
        ).astype(np.float32)
        R, t, s = sim3.exp(jnp.asarray(zeta))
        z2 = np.asarray(sim3.log(R, t, s))
        np.testing.assert_allclose(z2, zeta, atol=2e-3)

    def test_exp_zero_is_identity(self):
        R, t, s = sim3.exp(jnp.zeros(7, dtype=jnp.float32))
        np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-6)
        np.testing.assert_allclose(np.asarray(t), 0.0, atol=1e-6)
        np.testing.assert_allclose(float(s), 1.0, atol=1e-6)

    def test_matrix_roundtrip(self):
        rng = np.random.default_rng(8)
        R = se3.so3_exp(jnp.asarray(rng.standard_normal(3).astype(np.float32)))
        t = jnp.asarray(rng.standard_normal(3).astype(np.float32))
        s = jnp.asarray(1.8, dtype=jnp.float32)
        S = sim3.to_matrix(R, t, s)
        R2, t2, s2 = sim3.from_matrix(S)
        np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-4)
        np.testing.assert_allclose(np.asarray(t2), np.asarray(t), atol=1e-5)
        np.testing.assert_allclose(float(s2), 1.8, rtol=1e-4)


class TestCamera:
    def _tum_cam(self):
        # TUM fr1 intrinsics (reference Examples/RGB-D/TUM1.yaml)
        return cam_mod.Camera.create(
            fx=517.306408, fy=516.469215, cx=318.643040, cy=255.313989,
            k1=0.262383, k2=-0.953104, p1=-0.005358, p2=0.002628, k3=1.163314,
            width=640, height=480,
        )

    def test_undistort_matches_opencv(self):
        import cv2

        cam = self._tum_cam()
        rng = np.random.default_rng(9)
        uv = rng.uniform([40, 40], [600, 440], size=(200, 2)).astype(np.float32)
        ours = np.asarray(cam_mod.undistort_pixels(cam, jnp.asarray(uv)))
        K = np.asarray(cam.K, dtype=np.float64)
        dist = np.array([0.262383, -0.953104, -0.005358, 0.002628, 1.163314])
        ref = cv2.undistortPoints(uv.reshape(-1, 1, 2), K, dist, P=K).reshape(-1, 2)
        err = np.abs(ours - ref).max()
        assert err < 0.05, f"max undistort err {err} px"

    def test_project_unproject(self):
        cam = cam_mod.Camera.create(520.0, 520.0, 320.0, 240.0, bf=40.0)
        rng = np.random.default_rng(10)
        pc = np.stack(
            [rng.uniform(-2, 2, 100), rng.uniform(-1.5, 1.5, 100), rng.uniform(1, 10, 100)],
            axis=1,
        ).astype(np.float32)
        uvr = cam_mod.project_stereo(cam, jnp.asarray(pc))
        back = cam_mod.unproject(cam, uvr[..., :2], jnp.asarray(pc[:, 2]))
        np.testing.assert_allclose(np.asarray(back), pc, rtol=1e-4, atol=1e-4)
        # u_right = u - bf/z
        np.testing.assert_allclose(
            np.asarray(uvr[..., 2]), np.asarray(uvr[..., 0]) - 40.0 / pc[:, 2], rtol=1e-4
        )

    def test_distort_undistort_roundtrip(self):
        cam = self._tum_cam()
        rng = np.random.default_rng(11)
        xn = rng.uniform(-0.4, 0.4, size=(100, 2)).astype(np.float32)
        xd = cam_mod.distort_normalized(cam, jnp.asarray(xn))
        xu = cam_mod.undistort_normalized(cam, xd)
        np.testing.assert_allclose(np.asarray(xu), xn, atol=1e-4)


class TestConfig:
    def test_load_reference_yaml(self, tmp_path):
        from refactored_orb_slam2_tpu.utils.config import load_settings

        y = tmp_path / "s.yaml"
        y.write_text(
            "%YAML:1.0\n\n"
            "Camera.fx: 517.3\nCamera.fy: 516.5\nCamera.cx: 318.6\nCamera.cy: 255.3\n"
            "Camera.k1: 0.26\nCamera.k2: -0.95\nCamera.p1: -0.005\nCamera.p2: 0.002\n"
            "Camera.k3: 1.16\nCamera.fps: 30.0\nCamera.RGB: 1\nCamera.bf: 40.0\n"
            "ORBextractor.nFeatures: 1000\nORBextractor.scaleFactor: 1.2\n"
            "ORBextractor.nLevels: 8\nORBextractor.iniThFAST: 20\n"
            "ORBextractor.minThFAST: 7\nThDepth: 40.0\nDepthMapFactor: 5000.0\n"
            "LEFT.K: !!opencv-matrix\n   rows: 3\n   cols: 3\n   dt: d\n"
            "   data: [458.654, 0.0, 367.215, 0.0, 457.296, 248.375, 0.0, 0.0, 1.0]\n"
        )
        cfg = load_settings(str(y), sensor="rgbd")
        assert cfg.camera.fx == pytest.approx(517.3)
        assert cfg.orb.n_features == 1000
        assert cfg.tracking.th_depth == pytest.approx(40.0)
        assert cfg.orb.padded_keypoints == 1024
