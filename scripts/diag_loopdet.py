"""Diagnose loop detection on the street circuit: log BoW candidates,
consistency chaining, and Sim3 outcomes at every keyframe."""

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

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from refactored_orb_slam2_tpu.system import SlamSystem  # noqa: E402
from refactored_orb_slam2_tpu.backend import loop_closing as LC  # noqa: E402
from refactored_orb_slam2_tpu.utils.config import (  # noqa: E402
    CameraConfig, LoopConfig, MapConfig, ORBConfig, SystemConfig,
)
from refactored_orb_slam2_tpu.utils import world3d as W  # noqa: E402

BLOCK, ROAD_W = 22.0, 8.0


def make_cfg():
    return SystemConfig(
        sensor="stereo",
        camera=CameraConfig(fx=320.0, fy=320.0, cx=160.0, cy=120.0, bf=120.0,
                            width=320, height=240, fps=10),
        orb=ORBConfig(n_features=1000, n_levels=4),
        map=MapConfig(max_keyframes=128, max_points=16384, max_obs_per_point=12,
                      fuse_neighbors=4, triangulate_neighbors=4),
        loop=LoopConfig(),
    )


def main():
    cfg = make_cfg()
    world = W.scene_street(seed=41, block=BLOCK, road_w=ROAD_W)
    poses = W.traj_street_loop(125, block=BLOCK, road_w=ROAD_W, seed=41, laps=1.14)
    sys_ = SlamSystem(cfg)
    rng = np.random.default_rng(6)

    from refactored_orb_slam2_tpu.place.keyframe_db import detect_loop_candidates

    orig_detect = LC.detect

    def spy_detect(loop_state, db, covis, kf_slot, bow, **kw):
        cands, scores = detect_loop_candidates(db, bow, kf_slot, jnp.asarray(covis))
        cands_np = np.asarray(cands)
        out = orig_detect(loop_state, db, covis, kf_slot, bow, **kw)
        if (cands_np >= 0).any() or out:
            chains = [(sorted(g)[:3], c) for g, c in loop_state.consistent_groups]
            print(f"  KF{kf_slot} (frame {sys_.frame_id}): cands={cands_np} "
                  f"scores={np.round(np.asarray(scores), 3)} chains={chains} -> {out}",
                  flush=True)
        return out

    LC.detect = spy_detect

    orig_sim3 = LC.compute_sim3

    def spy_sim3(state, cam, kf_cur, kf_cand, **kw):
        r = orig_sim3(state, cam, kf_cur, kf_cand, **kw)
        print(f"    compute_sim3 KF{kf_cur} vs KF{kf_cand}: ok={r[0]} s={r[3]}",
              flush=True)
        return r

    LC.compute_sim3 = spy_sim3

    lost = 0
    for i, Tcw in enumerate(poses):
        L, R = world.render_stereo(Tcw, sys_.cam, noise=2.0, rng=rng)
        if sys_.track_stereo(L, R, i * 0.1) is None:
            lost += 1
    print(f"lost={lost} kf={sys_.n_kf} stats={sys_.stats}")
    le = np.asarray(sys_.map.kf_loop_edges)
    print("loop edges:", np.argwhere(le >= 0))


if __name__ == "__main__":
    main()
