"""Diagnose tracking loss in the async+pipelined bench configuration:
drive the bench scene and log per-frame scalar stats + state transitions.

    python scripts/diag_async_loss.py          # real chip
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax
import numpy as np

from refactored_orb_slam2_tpu.system import SlamSystem, TrackState
from refactored_orb_slam2_tpu.utils.config import (
    CameraConfig, MapConfig, ORBConfig, SystemConfig,
)
from refactored_orb_slam2_tpu.utils import world3d as W


def main():
    H, Wd = 480, 640
    cfg = SystemConfig(
        sensor="rgbd",
        camera=CameraConfig(fx=517.3, fy=516.5, cx=318.6, cy=255.3, bf=40.0,
                            width=Wd, height=H, fps=30),
        orb=ORBConfig(n_features=1000, n_levels=8),
        map=MapConfig(max_keyframes=512, max_points=65536,
                      max_obs_per_point=32),
    )
    async_ = os.environ.get("DIAG_SYNC") != "1"
    sys_ = SlamSystem(cfg, async_mapping=async_, pipelined=async_,
                      pipeline_depth=3)
    n_frames = int(os.environ.get("DIAG_FRAMES", "160"))
    world = W.scene_room(seed=11)
    poses = W.traj_room_orbit(n_frames, seed=5, span=0.45 * np.pi)
    rng = np.random.default_rng(0)
    frames = [
        world.render_device(T, sys_.cam, want_depth=True, noise=2.0, rng=rng)
        for T in poses
    ]
    jax.block_until_ready(frames[-1])

    t0 = time.perf_counter()
    orig_commit = sys_._commit_fused

    def commit(rec, *, optimistic):
        import jax as _jax

        poses_np, s = _jax.device_get((rec["poses_out"], rec["sc"]))
        print(f"  [{time.perf_counter() - t0:7.2f}s] f{rec['frame_id']:4d} "
              f"motion={int(s[0]):4d} "
              f"o1={int(s[1]):4d} map={int(s[2]):4d} ref={int(s[5]):4d} "
              f"kf={sys_.n_kf} pt={sys_.n_pt} state={sys_.state}",
            flush=True)
        return orig_commit(rec, optimistic=optimistic)

    sys_._commit_fused = commit

    # worker stage timing
    for name in ("_triangulate_new_points", "_fuse_neighbors", "_local_ba",
                 "_cull_keyframes", "_mapping_core", "_try_close_loop"):
        orig = getattr(sys_, name)

        def timed(*a, _orig=orig, _name=name, **k):
            s0 = time.perf_counter()
            r = _orig(*a, **k)
            print(f"  [{time.perf_counter() - t0:7.2f}s]   <{_name} "
                  f"{time.perf_counter() - s0:6.2f}s>", flush=True)
            return r

        setattr(sys_, name, timed)
    lost_at = []
    for i, (img, depth) in enumerate(frames):
        p = sys_.track_rgbd_device(img, depth, i / 30.0)
        if p is None:
            lost_at.append(i)
    sys_.flush_pipeline()
    if sys_.mapper is not None:
        ok = sys_.mapper.wait_idle(timeout=60)
        print(f"wait_idle ok={ok} queue={sys_.mapper.queue_len()} "
              f"idle={sys_.mapper.idle} "
              f"loop_idle={sys_.mapper._loop_idle.is_set()}")
        if not ok:
            import faulthandler

            faulthandler.dump_traceback()
    print(f"lost={len(lost_at)} at {lost_at[:20]} kf={sys_.n_kf} "
          f"pt={sys_.n_pt}")
    if sys_.mapper is not None and sys_.mapper._exc is not None:
        print("WORKER EXC:", repr(sys_.mapper._exc))
    sys.stdout.flush()
    os._exit(0)


if __name__ == "__main__":
    main()
