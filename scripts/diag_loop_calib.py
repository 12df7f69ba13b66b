"""Loop-closure diag with realistic calibration error: render with the true
camera, track with a slightly miscalibrated one so metric drift accumulates
and the loop pipeline genuinely fires at the revisit."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from refactored_orb_slam2_tpu.system import SlamSystem  # noqa: E402
from refactored_orb_slam2_tpu.geometry.camera import Camera  # noqa: E402
from refactored_orb_slam2_tpu.utils.config import (  # noqa: E402
    CameraConfig, LoopConfig, MapConfig, ORBConfig, SystemConfig,
)
from refactored_orb_slam2_tpu.utils import world3d as W  # noqa: E402
from refactored_orb_slam2_tpu.utils.synthetic import ate_rmse  # noqa: E402

BLOCK, ROAD_W = 22.0, 8.0
DF = float(os.environ.get("DF", "4.0"))     # focal miscalibration in px
N = int(os.environ.get("DIAG_FRAMES", "125"))


def main():
    cfg = SystemConfig(
        sensor="stereo",
        camera=CameraConfig(fx=320.0 + DF, fy=320.0 + DF, cx=160.0, cy=120.0,
                            bf=120.0, width=320, height=240, fps=10),
        orb=ORBConfig(n_features=1000, n_levels=4),
        map=MapConfig(max_keyframes=128, max_points=16384, max_obs_per_point=12,
                      fuse_neighbors=4, triangulate_neighbors=4),
        loop=LoopConfig(),
    )
    cam_true = Camera.create(fx=320.0, fy=320.0, cx=160.0, cy=120.0,
                             bf=120.0, width=320, height=240)
    world = W.scene_street(seed=41, block=BLOCK, road_w=ROAD_W)
    poses = W.traj_street_loop(N, block=BLOCK, road_w=ROAD_W, seed=41,
                               laps=N / 110.0)
    sys_ = SlamSystem(cfg)
    rng = np.random.default_rng(6)
    lost = 0
    for i, Tcw in enumerate(poses):
        L, R = world.render_stereo(Tcw, cam_true, noise=2.0, rng=rng)
        ok = sys_.track_stereo(L, R, i * 0.1) is not None
        if not ok:
            lost += 1
        if i % 10 == 0 or i > N - 16:
            print(f"f{i} ok={int(ok)} kf={sys_.n_kf} loops={sys_.stats['gba_runs']}",
                  flush=True)
    le = np.asarray(sys_.map.kf_loop_edges)
    print(f"lost={lost} kf={sys_.n_kf} stats={sys_.stats}")
    print("loop edges:", np.argwhere(le >= 0))
    gt = np.stack([-(T[:3, :3].T @ T[:3, 3]).astype(np.float32) for T in poses])
    est = sys_.camera_centers()
    ate = ate_rmse(est, gt[sys_.tracked_frame_ids()])
    path = float(np.linalg.norm(np.diff(gt, axis=0), axis=1).sum())
    print(f"ATE={ate:.3f} m over {path:.0f} m path")


if __name__ == "__main__":
    main()
