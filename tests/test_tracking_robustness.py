"""Tracking-robustness integration tests: TrackReferenceKeyFrame recovery
under sudden rotation (Tracking.cc:681-719) and the relocalization
50-inlier rescue cascade (Tracking.cc:1290-1360).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from refactored_orb_slam2_tpu.geometry import se3
from refactored_orb_slam2_tpu.system import SlamSystem, TrackState
from refactored_orb_slam2_tpu.utils.config import (
    CameraConfig, MapConfig, ORBConfig, SystemConfig, TrackingConfig,
)
from refactored_orb_slam2_tpu.utils.synthetic import SyntheticWorld, ate_rmse


def make_cfg(n_features=500, **tracking_kw):
    return SystemConfig(
        sensor="rgbd",
        camera=CameraConfig(
            fx=400.0, fy=400.0, cx=160.0, cy=120.0, bf=200.0,
            width=320, height=240, fps=10,
        ),
        orb=ORBConfig(n_features=n_features, n_levels=4),
        map=MapConfig(max_keyframes=32, max_points=8192, max_obs_per_point=8,
                      fuse_neighbors=4, triangulate_neighbors=4),
        tracking=TrackingConfig(**tracking_kw),
    )


def step_x(step):
    return np.asarray(se3.exp(jnp.asarray([step, 0, 0, 0, 0, 0], jnp.float32)))


def yaw(angle):
    return np.asarray(se3.exp(jnp.asarray([0, 0, 0, 0, angle, 0], jnp.float32)))


@pytest.mark.slow
class TestTrackReferenceKeyFrame:
    def test_sudden_rotation_recovery(self):
        """A one-frame yaw jump breaks the velocity-predicted projection
        window; the reference recovers through TrackReferenceKeyFrame's
        window-free matching — so must we."""
        cfg = make_cfg()
        world = SyntheticWorld.create(
            seed=11, n_points=700, x_range=(-10, 10), y_range=(-3, 3),
            z_range=(2.5, 10.0), clear_tube=0.0,
        )
        traj = [np.eye(4, dtype=np.float32)]
        for _ in range(7):
            traj.append(step_x(0.05) @ traj[-1])
        # sudden 14-degree yaw between consecutive frames: the projected
        # window misses by ~100 px at fx=400
        traj.append(yaw(0.25) @ traj[-1])
        for _ in range(3):
            traj.append(step_x(0.05) @ traj[-1])
        traj = np.stack(traj)

        sys_ = SlamSystem(cfg)
        rng = np.random.default_rng(7)
        lost = 0
        for i, Tcw in enumerate(traj):
            img = world.render(Tcw, sys_.cam, noise=2.0, rng=rng)
            depth = world.render_depth(Tcw, sys_.cam)
            if sys_.track_rgbd(img, depth, i * 0.1) is None:
                lost += 1
        assert lost == 0, f"lost {lost} frames across the rotation jump"
        assert sys_.stats["ref_kf_tracks"] >= 1, (
            "TrackReferenceKeyFrame never fired - the jump was absorbed by "
            "the motion model, weaken the test")
        gt = np.stack([-(T[:3, :3].T @ T[:3, 3]) for T in traj])
        ate = ate_rmse(sys_.camera_centers(), gt[sys_.tracked_frame_ids()])
        assert ate < 0.05, f"ATE {ate}"


@pytest.mark.slow
class TestLocalizationVO:
    def test_vo_through_unmapped_region(self):
        """Localization-only mode must keep tracking through regions the
        frozen map never covered, via temporal VO points from last-frame
        depth (mbVO, Tracking.cc:299-361) — the reference survives this;
        a map-only tracker goes LOST."""
        cfg = make_cfg()
        world = SyntheticWorld.create(
            seed=17, n_points=2200, x_range=(-4, 26), y_range=(-3, 3),
            z_range=(2.5, 9.0), clear_tube=0.0,
        )
        traj = [np.eye(4, dtype=np.float32)]
        for _ in range(7):
            traj.append(step_x(0.08) @ traj[-1])
        sys_ = SlamSystem(cfg)
        rng = np.random.default_rng(5)
        for i, Tcw in enumerate(traj):
            img = world.render(Tcw, sys_.cam, noise=2.0, rng=rng)
            depth = world.render_depth(Tcw, sys_.cam)
            assert sys_.track_rgbd(img, depth, i * 0.1) is not None or i == 0

        sys_.activate_localization_mode()
        n_kf = sys_.n_kf
        # drive ~4.5 m beyond the mapped region
        T = traj[-1]
        lost = 0
        for k in range(18):
            T = step_x(0.25) @ T
            img = world.render(T, sys_.cam, noise=2.0, rng=rng)
            depth = world.render_depth(T, sys_.cam)
            if sys_.track_rgbd(img, depth, 10.0 + k * 0.1) is None:
                lost += 1
        assert lost == 0, f"lost {lost} frames in the unmapped region"
        assert sys_.stats["vo_tracks"] > 0, "VO mode never engaged"
        assert sys_.mb_vo, "expected pure-VO state far from the map"
        assert sys_.n_kf == n_kf, "localization mode must not insert keyframes"


@pytest.mark.slow
class TestRelocalization:
    def _run(self, sys_, world, poses, rng, t0=0.0):
        results = []
        for i, Tcw in enumerate(poses):
            img = world.render(Tcw, sys_.cam, noise=2.0, rng=rng)
            depth = world.render_depth(Tcw, sys_.cam)
            results.append(sys_.track_rgbd(img, depth, t0 + i * 0.1))
        return results

    def test_reloc_rescue_and_rejection(self):
        """After tracking loss: a barely-overlapping view must be REJECTED
        by the 50-inlier bar; a well-mapped view must relocalize (with the
        projection rescue contributing)."""
        cfg = make_cfg(min_frames_between_kf=1)
        world = SyntheticWorld.create(
            seed=13, n_points=800, x_range=(-6, 14), y_range=(-3, 3),
            z_range=(2.5, 9.0), clear_tube=0.0,
        )
        traj = [np.eye(4, dtype=np.float32)]
        for _ in range(15):
            traj.append(step_x(0.08) @ traj[-1])
        traj = np.stack(traj)
        sys_ = SlamSystem(cfg)
        rng = np.random.default_rng(9)
        self._run(sys_, world, traj, rng)
        assert sys_.n_kf > 5, "need >5 keyframes so LOST does not auto-reset"
        assert sys_.state == TrackState.OK

        # blackout -> LOST
        black = np.zeros((240, 320), np.float32)
        zdep = np.zeros((240, 320), np.float32)
        for k in range(2):
            assert sys_.track_rgbd(black, zdep, 10.0 + k * 0.1) is None
        assert sys_.state == TrackState.LOST

        # barely-overlapping view: camera yawed 60 degrees away from the
        # mapped frustum - too few common landmarks for the 50-inlier bar
        T_away = yaw(1.05) @ traj[8]
        img = world.render(T_away, sys_.cam, noise=2.0, rng=rng)
        dep = world.render_depth(T_away, sys_.cam)
        assert sys_.track_rgbd(img, dep, 20.0) is None
        assert sys_.state == TrackState.LOST

        # well-mapped view: relocalize and keep tracking
        revisit = [traj[8] for _ in range(1)] + [
            step_x(0.04 * (i + 1)) @ traj[8] for i in range(3)
        ]
        res = self._run(sys_, world, revisit, rng, t0=30.0)
        assert res[0] is not None, "relocalization failed on a mapped view"
        assert sys_.stats["relocs"] == 1
        assert all(r is not None for r in res[1:]), "tracking after reloc lost"
        # relocated pose must be close to ground truth
        C_est = -(res[0][:3, :3].T @ res[0][:3, 3])
        C_gt = -(traj[8][:3, :3].T @ traj[8][:3, 3])
        assert np.linalg.norm(C_est - C_gt) < 0.05
