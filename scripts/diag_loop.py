"""Diagnostic: per-frame telemetry on the street-circuit loop e2e scenario.

Instruments the fused tracking path to report which gate kills tracking
(motion-match count, pose-opt inliers, local-map bar, reloc) frame by frame.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402

from refactored_orb_slam2_tpu.system import SlamSystem, TrackState  # noqa: E402
from refactored_orb_slam2_tpu.utils.config import (  # noqa: E402
    CameraConfig, LoopConfig, MapConfig, ORBConfig, SystemConfig,
)
from refactored_orb_slam2_tpu.utils import world3d as W  # noqa: E402

BLOCK, ROAD_W = 22.0, 8.0
N_FRAMES = int(os.environ.get("DIAG_FRAMES", "110"))


def make_cfg():
    return SystemConfig(
        sensor="stereo",
        camera=CameraConfig(
            fx=320.0, fy=320.0, cx=160.0, cy=120.0, bf=120.0,
            width=320, height=240, fps=10,
        ),
        orb=ORBConfig(n_features=1000, n_levels=4),
        map=MapConfig(
            max_keyframes=128, max_points=16384, max_obs_per_point=12,
            fuse_neighbors=4, triangulate_neighbors=4,
        ),
        loop=LoopConfig(),
    )


def main():
    cfg = make_cfg()
    world = W.scene_street(seed=41, block=BLOCK, road_w=ROAD_W)
    poses = W.traj_street_loop(N_FRAMES, block=BLOCK, road_w=ROAD_W, seed=41, laps=N_FRAMES / 110.0)
    sys_ = SlamSystem(cfg)
    rng = np.random.default_rng(6)

    # wrap the fused-track jit to capture scalars
    orig = sys_._jit_fused_track
    last_sc = {}

    def spy(*args):
        out = orig(*args)
        last_sc["sc"] = {k: int(v) for k, v in out[-1].items()}
        return out

    sys_._jit_fused_track = spy

    lost = 0
    for i, Tcw in enumerate(poses):
        L, R = world.render_stereo(Tcw, sys_.cam, noise=2.0, rng=rng)
        last_sc["sc"] = None
        st_before = sys_.state
        nkf0 = sys_.n_kf
        pose = sys_.track_stereo(L, R, i * 0.1)
        ok = pose is not None
        if not ok:
            lost += 1
        sc = last_sc["sc"]
        err = ""
        if ok:
            est_c = -(pose[:3, :3].T @ pose[:3, 3])
            gt_c = -(Tcw[:3, :3].T @ Tcw[:3, 3])
            err = f"err={np.linalg.norm(est_c - gt_c):.3f}m"
        print(
            f"f{i:3d} st={st_before}->{sys_.state} ok={int(ok)} "
            f"kf={sys_.n_kf}({'+' if sys_.n_kf > nkf0 else ''}) pt={sys_.n_pt} "
            + (f"mot={sc['n_motion']} inl1={sc['n_inl1']} "
               f"map={sc['n_map_inliers']} ref={sc.get('ref_tracked','?')} "
               f"tc={sc.get('tracked_close','?')}/{sc.get('untracked_close','?')} "
               if sc else "")
            + err,
            flush=True,
        )
    print(f"\nlost={lost} stats={sys_.stats}")
    le = np.asarray(sys_.map.kf_loop_edges)
    print("loop edges:", np.where(le >= 0))


if __name__ == "__main__":
    main()
