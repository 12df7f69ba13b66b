"""Diagnose the mono Sim3 loop-closure scale correction: snapshot keyframe
scale drift before correction, after the 7-DoF essential graph, and at the
end (post-GBA).  JAX_PLATFORMS=cpu python scripts/diag_mono_loop.py"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np

from refactored_orb_slam2_tpu.system import SlamSystem
from refactored_orb_slam2_tpu.geometry.camera import Camera
from refactored_orb_slam2_tpu.utils.config import (
    CameraConfig, LoopConfig, MapConfig, ORBConfig, SystemConfig,
)
from refactored_orb_slam2_tpu.utils import world3d as W

BLOCK, ROAD_W = 22.0, 8.0
DF = 4.0


def win_scale(E, G):
    E = E - E.mean(0)
    G = G - G.mean(0)
    C = G.T @ E / len(E)
    _, D, _ = np.linalg.svd(C)
    var_e = (E ** 2).sum() / len(E)
    return float(D.sum() / max(var_e, 1e-12))


def scale_profile(sys_, gt_centers_all, kf_pose=None, kf_valid=None,
                  kf_fid=None, w=12):
    kf_pose = np.asarray(sys_.map.kf_pose) if kf_pose is None else kf_pose
    kf_valid = np.asarray(sys_.map.kf_valid) if kf_valid is None else kf_valid
    kf_fid = np.asarray(sys_.map.kf_frame_id) if kf_fid is None else kf_fid
    sel = np.where(kf_valid)[0]
    sel = sel[np.argsort(kf_fid[sel])]
    cs = np.stack([-(kf_pose[k][:3, :3].T @ kf_pose[k][:3, 3]) for k in sel])
    gids = np.clip(kf_fid[sel] - 1, 0, len(gt_centers_all) - 1)
    gt = gt_centers_all[gids]
    n = len(cs)
    scales = []
    for a in range(0, n - w + 1, max(w // 2, 1)):
        scales.append(round(win_scale(cs[a:a + w], gt[a:a + w]), 4))
    return scales, cs, gt


def main():
    cfg = SystemConfig(
        sensor="monocular",
        camera=CameraConfig(fx=320.0 + DF, fy=320.0 + DF, cx=160.0, cy=120.0,
                            bf=120.0, width=320, height=240, fps=10),
        orb=ORBConfig(n_features=1000, n_levels=4),
        map=MapConfig(max_keyframes=160, max_points=16384,
                      max_obs_per_point=12, fuse_neighbors=4,
                      triangulate_neighbors=4),
        loop=LoopConfig(),
    )
    cam_true = Camera.create(fx=320.0, fy=320.0, cx=160.0, cy=120.0,
                             bf=120.0, width=320, height=240)
    world = W.scene_street(seed=41, block=BLOCK, road_w=ROAD_W)
    n_frames = 150
    poses = W.traj_street_loop(n_frames, block=BLOCK, road_w=ROAD_W, seed=41,
                               laps=n_frames / 110.0)
    gt_centers_all = np.stack([
        -(T[:3, :3].T @ T[:3, 3]).astype(np.float32) for T in poses
    ])
    sys_ = SlamSystem(cfg)

    snaps = {}
    orig_correct = sys_._correct_loop
    orig_gba = sys_._launch_gba

    def snapping_correct(kf_cur, kf_loop, R_cm, t_cm, s_cm):
        if "pre" not in snaps:
            snaps["pre"] = (np.asarray(sys_.map.kf_pose).copy(),
                            np.asarray(sys_.map.kf_valid).copy(),
                            np.asarray(sys_.map.kf_frame_id).copy())
            snaps["s_cm"] = float(s_cm)
            snaps["pair"] = (kf_cur, kf_loop)
        r = orig_correct(kf_cur, kf_loop, R_cm, t_cm, s_cm)
        if "post_eg" not in snaps:
            snaps["post_eg"] = (np.asarray(sys_.map.kf_pose).copy(),
                                np.asarray(sys_.map.kf_valid).copy(),
                                np.asarray(sys_.map.kf_frame_id).copy())
        return r

    def snapping_gba(kf_cur, iters=10):
        r = orig_gba(kf_cur, iters)
        if "post_gba" not in snaps:
            snaps["post_gba"] = (np.asarray(sys_.map.kf_pose).copy(),
                                 np.asarray(sys_.map.kf_valid).copy(),
                                 np.asarray(sys_.map.kf_frame_id).copy())
        return r

    sys_._correct_loop = snapping_correct
    sys_._launch_gba = snapping_gba

    rng = np.random.default_rng(6)
    lost = 0
    for i, Tcw in enumerate(poses):
        img = world.render(Tcw, cam_true, noise=2.0, rng=rng)
        if sys_.track_monocular(img, i * 0.1) is None:
            lost += 1
    print(f"lost={lost} kf={sys_.n_kf} pt={sys_.n_pt} "
          f"gba_runs={sys_.stats['gba_runs']} pair={snaps.get('pair')} "
          f"s_cm={snaps.get('s_cm')}")
    for tag in ("pre", "post_eg", "post_gba"):
        if tag in snaps:
            sc, _, _ = scale_profile(sys_, gt_centers_all, *snaps[tag])
            print(f"{tag:9s} scale profile: {sc}")
    sc, _, _ = scale_profile(sys_, gt_centers_all)
    print(f"{'final':9s} scale profile: {sc}")


if __name__ == "__main__":
    main()
