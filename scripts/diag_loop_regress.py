"""Diagnose the stereo loop e2e regression: instrument detection/Sim3.

JAX_PLATFORMS=cpu python scripts/diag_loop_regress.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np

from refactored_orb_slam2_tpu.system import SlamSystem
from refactored_orb_slam2_tpu.backend import loop_closing as LC
from refactored_orb_slam2_tpu.geometry.camera import Camera
from refactored_orb_slam2_tpu.utils.config import (
    CameraConfig, LoopConfig, MapConfig, ORBConfig, SystemConfig,
)
from refactored_orb_slam2_tpu.utils import world3d as W

BLOCK, ROAD_W = 22.0, 8.0
DF = 4.0


def main():
    cfg = SystemConfig(
        sensor="stereo",
        camera=CameraConfig(fx=320.0 + DF, fy=320.0 + DF, cx=160.0, cy=120.0,
                            bf=120.0, width=320, height=240, fps=10),
        orb=ORBConfig(n_features=1000, n_levels=4),
        map=MapConfig(max_keyframes=128, max_points=16384,
                      max_obs_per_point=12, fuse_neighbors=4,
                      triangulate_neighbors=4),
        loop=LoopConfig(),
    )
    cam_true = Camera.create(fx=320.0, fy=320.0, cx=160.0, cy=120.0,
                             bf=120.0, width=320, height=240)
    world = W.scene_street(seed=41, block=BLOCK, road_w=ROAD_W)
    poses = W.traj_street_loop(125, block=BLOCK, road_w=ROAD_W, seed=41,
                               laps=125 / 110.0)
    sys_ = SlamSystem(cfg)

    from refactored_orb_slam2_tpu.place.keyframe_db import (
        detect_loop_candidates,
    )
    import refactored_orb_slam2_tpu.place.keyframe_db as KDB

    orig_cands = detect_loop_candidates

    def loud_cands(db, bow, kf, covis, **kw):
        cands, scores = orig_cands(db, bow, kf, covis, **kw)
        c = [int(x) for x in np.asarray(cands) if x >= 0]
        if c:
            print(f"  kf{kf}: raw candidates {c} "
                  f"scores {[round(float(s), 3) for s in np.asarray(scores)[:len(c)]]}",
                  flush=True)
        return cands, scores

    KDB.detect_loop_candidates = loud_cands

    orig_detect = LC.detect

    def loud_detect(*a, **k):
        r = orig_detect(*a, **k)
        if r:
            print(f"  CONSISTENT candidates: {r}", flush=True)
        return r

    LC.detect = loud_detect
    orig_sim3 = LC.compute_sim3

    def loud_sim3(state, cam, kf_cur, kf_cand, **kw):
        ok, R, t, s, pairs = orig_sim3(state, cam, kf_cur, kf_cand, **kw)
        n_pairs = len(pairs) if pairs is not None else 0
        print(f"  sim3 kf{kf_cur}<-{kf_cand}: ok={ok} pairs={n_pairs}",
              flush=True)
        return ok, R, t, s, pairs

    LC.compute_sim3 = loud_sim3

    rng = np.random.default_rng(6)
    lost = 0
    for i, Tcw in enumerate(poses):
        L, R = world.render_stereo(Tcw, cam_true, noise=2.0, rng=rng)
        if sys_.track_stereo(L, R, i * 0.1) is None:
            lost += 1
    loop_edges = np.asarray(sys_.map.kf_loop_edges)
    covis = np.asarray(sys_._jit_covis(sys_.map))
    n = sys_.n_kf
    row_max = covis[:n].max(axis=1)
    n_conn = (covis[:n] >= 15).sum(axis=1)
    obs = np.asarray(sys_.map.pt_obs_kf)
    n_obs = (obs >= 0).sum(axis=1)
    pv = np.asarray(sys_.map.pt_valid)
    print(f"covis row max: median={np.median(row_max):.0f} "
          f"min={row_max.min()} max={row_max.max()}")
    print(f"connected(>=15) per kf: median={np.median(n_conn):.0f} "
          f"zero-conn kfs={(n_conn == 0).sum()}/{n}")
    print(f"obs per valid point: mean={n_obs[pv].mean():.2f} "
          f"max={n_obs[pv].max()}")
    print(f"lost={lost} kf={sys_.n_kf} pt={sys_.n_pt} "
          f"loop_edge={bool((loop_edges >= 0).any())} "
          f"gba={sys_.stats['gba_runs']}")


if __name__ == "__main__":
    main()
