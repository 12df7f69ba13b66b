"""Per-frame diagnostic of the bench scenario on the raycast room world
(TUM fr1/desk analog): where does each tracked frame's wall time go?

Frames are pre-rendered so only SLAM work is timed.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from refactored_orb_slam2_tpu.system import SlamSystem
from refactored_orb_slam2_tpu.utils.config import (
    CameraConfig, MapConfig, ORBConfig, SystemConfig,
)
from refactored_orb_slam2_tpu.utils import world3d as W

N_FRAMES = 120


def main():
    H, Wd = 480, 640
    cfg = SystemConfig(
        sensor="rgbd",
        camera=CameraConfig(fx=517.3, fy=516.5, cx=318.6, cy=255.3, bf=40.0,
                            width=Wd, height=H, fps=30),
        orb=ORBConfig(n_features=1000, n_levels=8),
        map=MapConfig(max_keyframes=512, max_points=65536, max_obs_per_point=32),
    )
    sys_ = SlamSystem(cfg)
    world = W.scene_room(seed=11)
    poses = W.traj_room_orbit(N_FRAMES, seed=5)
    rng = np.random.default_rng(0)
    print("rendering...", flush=True)
    frames = []
    for T in poses:
        img, dep = world.render(T, sys_.cam, want_depth=True, noise=2.0, rng=rng)
        frames.append((img, dep))
    print("rendered", flush=True)

    orig = sys_._jit_fused_track
    last_sc = {}

    def spy(*args):
        t0 = time.perf_counter()
        out = orig(*args)
        t1 = time.perf_counter()
        last_sc["sc"] = {k: int(v) for k, v in out[-1].items()}
        t2 = time.perf_counter()
        last_sc["t_dispatch"] = (t1 - t0) * 1e3
        last_sc["t_sync"] = (t2 - t1) * 1e3
        return out

    sys_._jit_fused_track = spy

    lost = 0
    times = []
    for i, (img, dep) in enumerate(frames):
        last_sc.clear()
        st0 = sys_.state
        nkf0 = sys_.n_kf
        t0 = time.perf_counter()
        pose = sys_.track_rgbd(img, dep, i / 30.0)
        dt = (time.perf_counter() - t0) * 1e3
        times.append(dt)
        ok = pose is not None
        if not ok:
            lost += 1
        sc = last_sc.get("sc")
        print(f"f{i:3d} st={st0}->{sys_.state} ok={int(ok)} "
              f"kf={sys_.n_kf}{'+' if sys_.n_kf > nkf0 else ' '} pt={sys_.n_pt} "
              f"t={dt:7.1f}ms disp={last_sc.get('t_dispatch', 0):5.1f} "
              f"sync={last_sc.get('t_sync', 0):6.1f} "
              + (f"mot={sc['n_motion']} map={sc['n_map_inliers']}" if sc else ""),
              flush=True)
    t = np.asarray(times[10:])
    nokf = [dt for i, dt in enumerate(times) if i >= 10]
    print(f"lost={lost} kf={sys_.n_kf} median={np.median(t):.1f}ms "
          f"mean={t.mean():.1f}ms stats={sys_.stats}")


if __name__ == "__main__":
    main()
