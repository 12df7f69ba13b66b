"""Live loop-closure end-to-end test: drive a closed circuit through the
full SlamSystem (detection via the corpus-trained vocabulary, 3-consistency
chaining, Sim3, SearchAndFuse over the corrected group, LoopConnections,
essential graph, GBA) and assert the loop is found and the drift corrected.

The frames are rendered with the TRUE camera while the system tracks with a
slightly miscalibrated one (+4 px focal, ~1.2% — a realistic calibration
error).  Without it, stereo tracking on this circuit is so accurate that
the tracker re-matches the old landmarks at the revisit, the new keyframes
become covisible with the old ones, and loop *detection* is correctly
suppressed (candidates must not be connected, KeyFrameDatabase.cc:91-99) —
the reference behaves the same when there is nothing to correct.  The
miscalibration accumulates real metric drift around the circuit, so the
revisit exercises the genuine pipeline: BoW candidates over unconnected
keyframes -> consistency chain -> Sim3 -> correction -> GBA.
"""

import numpy as np
import pytest

from refactored_orb_slam2_tpu.system import SlamSystem
from refactored_orb_slam2_tpu.geometry.camera import Camera
from refactored_orb_slam2_tpu.utils.config import (
    CameraConfig, LoopConfig, MapConfig, ORBConfig, SystemConfig,
)
from refactored_orb_slam2_tpu.utils import world3d as W
from refactored_orb_slam2_tpu.utils.synthetic import ate_rmse


BLOCK, ROAD_W = 22.0, 8.0
DF = 4.0   # focal miscalibration (px) fed to the tracker


def make_cfg():
    return SystemConfig(
        sensor="stereo",
        camera=CameraConfig(
            fx=320.0 + DF, fy=320.0 + DF, cx=160.0, cy=120.0, bf=120.0,
            width=320, height=240, fps=10,
        ),
        # the reference's keyframe-decision thresholds are absolute counts
        # tuned for its 1000-2000 feature budgets (NeedNewKeyFrame's
        # 70/100 close-point bars, Tracking.cc:919); run the same budget
        orb=ORBConfig(n_features=1000, n_levels=4),
        map=MapConfig(
            max_keyframes=128, max_points=16384, max_obs_per_point=12,
            fuse_neighbors=4, triangulate_neighbors=4,
        ),
        loop=LoopConfig(),
    )


@pytest.mark.slow
class TestLoopClosureE2E:
    def test_street_circuit_closes_loop(self):
        cfg = make_cfg()
        cam_true = Camera.create(fx=320.0, fy=320.0, cx=160.0, cy=120.0,
                                 bf=120.0, width=320, height=240)
        world = W.scene_street(seed=41, block=BLOCK, road_w=ROAD_W)
        # 1.14 laps: the loop-consistency gate needs a few keyframes past
        # the revisit point to chain 3 consistent detections
        poses = W.traj_street_loop(
            125, block=BLOCK, road_w=ROAD_W, seed=41, laps=125 / 110.0
        )
        sys_ = SlamSystem(cfg)
        rng = np.random.default_rng(6)
        lost = 0
        for i, Tcw in enumerate(poses):
            L, R = world.render_stereo(Tcw, cam_true, noise=2.0, rng=rng)
            if sys_.track_stereo(L, R, i * 0.1) is None:
                lost += 1
        assert lost <= 2, f"lost {lost} frames on the circuit"
        # the loop must have been detected and corrected
        loop_edges = np.asarray(sys_.map.kf_loop_edges)
        assert (loop_edges >= 0).any(), "no loop edge was ever added"
        assert sys_.stats["gba_runs"] >= 1, "loop correction never ran GBA"
        # closed-circuit accuracy after correction
        gt = np.stack([
            -(T[:3, :3].T @ T[:3, 3]).astype(np.float32) for T in poses
        ])
        est = sys_.camera_centers()
        ate = ate_rmse(est, gt[sys_.tracked_frame_ids()])
        path = float(np.linalg.norm(np.diff(gt, axis=0), axis=1).sum())
        assert ate < 0.01 * path, f"ATE {ate:.3f} m over {path:.0f} m"
