"""End-to-end SLAM integration tests on synthetic rendered sequences.

The reference's de-facto integration test is running the example binaries
on TUM/KITTI and checking ATE (SURVEY §4); with no datasets in the image,
these tests render a controlled world and assert trajectory accuracy.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from refactored_orb_slam2_tpu.geometry import se3
from refactored_orb_slam2_tpu.system import SlamSystem
from refactored_orb_slam2_tpu.utils.config import (
    CameraConfig, MapConfig, ORBConfig, SystemConfig,
)
from refactored_orb_slam2_tpu.utils.synthetic import SyntheticWorld, ate_rmse


def make_cfg(sensor, n_features=500):
    # bf sized so disparities stay small relative to the 320-px image
    # (a 0.5 m baseline at this scale leaves a wide occluded strip with no
    # right-image counterparts)
    return SystemConfig(
        sensor=sensor,
        camera=CameraConfig(
            fx=400.0, fy=400.0, cx=160.0, cy=120.0,
            bf=80.0 if sensor == "stereo" else 200.0,
            width=320, height=240, fps=10,
        ),
        orb=ORBConfig(n_features=n_features, n_levels=4),
        map=MapConfig(max_keyframes=24, max_points=4096, max_obs_per_point=8,
                      fuse_neighbors=4, triangulate_neighbors=4),
    )


def lateral_traj(n, step=0.06):
    motion = np.asarray(se3.exp(jnp.asarray([step, 0, 0, 0, 0, 0], jnp.float32)))
    out = [np.eye(4, dtype=np.float32)]
    for _ in range(n - 1):
        out.append(motion @ out[-1])
    return np.stack(out)


def gt_centers(traj):
    return np.stack([-(T[:3, :3].T @ T[:3, 3]) for T in traj])


@pytest.mark.slow
class TestEndToEnd:
    def test_rgbd_sequence(self):
        cfg = make_cfg("rgbd")
        world = SyntheticWorld.create(
            seed=3, n_points=500, x_range=(-6, 6), y_range=(-2.5, 2.5),
            z_range=(2.5, 10.0), clear_tube=0.0,
        )
        traj = lateral_traj(12)
        sys_ = SlamSystem(cfg)
        rng = np.random.default_rng(1)
        lost = 0
        for i, Tcw in enumerate(traj):
            img = world.render(Tcw, sys_.cam, noise=2.0, rng=rng)
            depth = world.render_depth(Tcw, sys_.cam)
            if sys_.track_rgbd(img, depth, i * 0.1) is None:
                lost += 1
        assert lost == 0
        ate = ate_rmse(sys_.camera_centers(), gt_centers(traj))
        # 66 cm path; reference-grade RGB-D accuracy is ~1-2 cm
        assert ate < 0.02, f"ATE {ate}"

    def test_stereo_sequence(self):
        cfg = make_cfg("stereo")
        world = SyntheticWorld.create(
            seed=4, n_points=500, x_range=(-6, 6), y_range=(-2.5, 2.5),
            z_range=(2.5, 10.0), clear_tube=0.0,
        )
        traj = lateral_traj(10)
        sys_ = SlamSystem(cfg)
        rng = np.random.default_rng(2)
        lost = 0
        for i, Tcw in enumerate(traj):
            L, R = world.render_stereo(Tcw, sys_.cam, noise=2.0, rng=rng)
            if sys_.track_stereo(L, R, i * 0.1) is None:
                lost += 1
        assert lost == 0
        ate = ate_rmse(sys_.camera_centers(), gt_centers(traj))
        assert ate < 0.05, f"ATE {ate}"

    def test_trajectory_export(self, tmp_path):
        cfg = make_cfg("rgbd", n_features=400)
        world = SyntheticWorld.create(seed=5, n_points=400, z_range=(2.5, 9.0), clear_tube=0.0)
        traj = lateral_traj(5)
        sys_ = SlamSystem(cfg)
        rng = np.random.default_rng(3)
        for i, Tcw in enumerate(traj):
            img = world.render(Tcw, sys_.cam, noise=2.0, rng=rng)
            depth = world.render_depth(Tcw, sys_.cam)
            sys_.track_rgbd(img, depth, i * 0.1)
        tum = tmp_path / "traj_tum.txt"
        kitti = tmp_path / "traj_kitti.txt"
        sys_.export_trajectory_tum(str(tum))
        sys_.export_trajectory_kitti(str(kitti))
        tum_lines = tum.read_text().strip().split("\n")
        # frames before initialization are not logged
        assert 0 < len(tum_lines) <= len(traj)
        parts = tum_lines[0].split()
        assert len(parts) == 8  # t x y z qx qy qz qw
        q = np.asarray([float(v) for v in parts[4:]])
        assert abs(np.linalg.norm(q) - 1.0) < 1e-5
        kitti_lines = kitti.read_text().strip().split("\n")
        assert 0 < len(kitti_lines) <= len(traj)
        assert len(kitti_lines[0].split()) == 12


@pytest.mark.slow
class TestFacade:
    def test_localization_mode_and_reset(self):
        """Localization-only mode freezes the map; reset clears everything."""
        cfg = make_cfg("rgbd", n_features=400)
        world = SyntheticWorld.create(
            seed=6, n_points=450, z_range=(2.5, 9.0), clear_tube=0.0
        )
        traj = lateral_traj(8, step=0.05)
        sys_ = SlamSystem(cfg)
        rng = np.random.default_rng(4)
        for i, Tcw in enumerate(traj[:4]):
            img = world.render(Tcw, sys_.cam, noise=2.0, rng=rng)
            depth = world.render_depth(Tcw, sys_.cam)
            sys_.track_rgbd(img, depth, i * 0.1)
        n_kf_before = sys_.n_kf
        n_pt_before = sys_.n_pt
        sys_.activate_localization_mode()
        ok = 0
        for i, Tcw in enumerate(traj[4:]):
            img = world.render(Tcw, sys_.cam, noise=2.0, rng=rng)
            depth = world.render_depth(Tcw, sys_.cam)
            if sys_.track_rgbd(img, depth, (4 + i) * 0.1) is not None:
                ok += 1
        assert ok == len(traj) - 4          # still tracks
        assert sys_.n_kf == n_kf_before     # map frozen
        assert sys_.n_pt == n_pt_before
        # keyframe trajectory export works
        import tempfile, os
        with tempfile.TemporaryDirectory() as d:
            p = os.path.join(d, "kf.txt")
            sys_.export_keyframe_trajectory_tum(p)
            lines = open(p).read().strip().split("\n")
            assert len(lines) == n_kf_before
        sys_.reset()
        assert sys_.n_kf == 0 and sys_.n_pt == 0
        assert not bool(np.asarray(sys_.map.kf_valid).any())
        assert sys_.state == 0  # NOT_INITIALIZED


@pytest.mark.slow
class TestMonocular:
    def test_mono_sequence(self):
        """Monocular bootstrap + tracking + triangulation-based mapping."""
        cfg = make_cfg("monocular", n_features=600)
        world = SyntheticWorld.create(
            seed=7, n_points=500, x_range=(-6, 6), y_range=(-2.5, 2.5),
            z_range=(2.5, 10.0), clear_tube=0.0,
        )
        traj = lateral_traj(14, step=0.06)
        sys_ = SlamSystem(cfg)
        rng = np.random.default_rng(5)
        ok = 0
        for i, Tcw in enumerate(traj):
            img = world.render(Tcw, sys_.cam, noise=2.0, rng=rng)
            if sys_.track_monocular(img, i * 0.1) is not None:
                ok += 1
        assert sys_.state == 1, "monocular init never succeeded"
        assert ok >= 10
        from refactored_orb_slam2_tpu.utils.synthetic import ate_rmse_sim3

        est = sys_.camera_centers()
        gt = gt_centers(traj)[sys_.tracked_frame_ids()]
        ate = ate_rmse_sim3(est, gt)
        assert ate < 0.05, f"mono ATE {ate}"
