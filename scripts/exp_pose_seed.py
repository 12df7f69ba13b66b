"""Controlled experiment: pose-only-LM seeding, neutral (last pose) vs the
reference's velocity-extrapolated prediction (Tracking.cc:787).

Round-1/2 reviews asked for real evidence behind this engine's deliberate
divergence.  Scenario: the 125-frame miscalibrated street circuit (the loop
e2e input — fast automotive motion where seeding matters most).  Reports
lost frames and ATE for both variants.

    JAX_PLATFORMS=cpu python scripts/exp_pose_seed.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    jax.config.update("jax_default_matmul_precision", "highest")

import dataclasses
import json

import numpy as np

from refactored_orb_slam2_tpu.system import SlamSystem
from refactored_orb_slam2_tpu.geometry.camera import Camera
from refactored_orb_slam2_tpu.utils.config import (
    CameraConfig, LoopConfig, MapConfig, ORBConfig, SystemConfig,
    TrackingConfig,
)
from refactored_orb_slam2_tpu.utils import world3d as W
from refactored_orb_slam2_tpu.utils.synthetic import ate_rmse

BLOCK, ROAD_W, DF = 22.0, 8.0, 4.0


def run(seed_from_prediction: bool):
    cfg = SystemConfig(
        sensor="stereo",
        camera=CameraConfig(fx=320.0 + DF, fy=320.0 + DF, cx=160.0, cy=120.0,
                            bf=120.0, width=320, height=240, fps=10),
        orb=ORBConfig(n_features=1000, n_levels=4),
        tracking=TrackingConfig(
            seed_pose_opt_from_prediction=seed_from_prediction
        ),
        map=MapConfig(max_keyframes=128, max_points=16384, max_obs_per_point=12,
                      fuse_neighbors=4, triangulate_neighbors=4),
        loop=LoopConfig(),
    )
    cam_true = Camera.create(fx=320.0, fy=320.0, cx=160.0, cy=120.0,
                             bf=120.0, width=320, height=240)
    world = W.scene_street(seed=41, block=BLOCK, road_w=ROAD_W)
    poses = W.traj_street_loop(125, block=BLOCK, road_w=ROAD_W, seed=41,
                               laps=125 / 110.0)
    sys_ = SlamSystem(cfg)
    rng = np.random.default_rng(6)
    lost = 0
    for i, Tcw in enumerate(poses):
        L, R = world.render_stereo(Tcw, cam_true, noise=2.0, rng=rng)
        if sys_.track_stereo(L, R, i * 0.1) is None:
            lost += 1
    gt = np.stack([-(T[:3, :3].T @ T[:3, 3]).astype(np.float32) for T in poses])
    est = sys_.camera_centers()
    ate = ate_rmse(est, gt[sys_.tracked_frame_ids()])
    return dict(seed="predicted" if seed_from_prediction else "last_pose",
                lost=lost, kf=sys_.n_kf, ate_m=round(float(ate), 4),
                gba_runs=sys_.stats["gba_runs"])


def main():
    results = [run(False), run(True)]
    for r in results:
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
