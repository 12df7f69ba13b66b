"""Profile the keyframe-rate mapping pipeline per stage on the real chip.

Uses the same raycast room orbit as bench.py (so keyframe cadence matches
the headline run) and wraps each mapping stage with sync timing — the
numbers INCLUDE the host<->device round trip each stage pays in the
synchronous pipeline, which is what the tracker experiences.
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
    n_frames = 120
    poses = W.traj_room_orbit(n_frames, seed=5, span=0.9 * np.pi)
    rng = np.random.default_rng(0)

    stage_t = {}

    def wrap(name, fn):
        def wrapped(*a, **k):
            t0 = time.perf_counter()
            r = fn(*a, **k)
            if r is not None:
                jax.block_until_ready(jax.tree_util.tree_leaves(r)[:1])
            else:
                jax.block_until_ready(
                    jax.tree_util.tree_leaves(sys_.map)[:1])
            stage_t[name] = stage_t.get(name, 0.0) + time.perf_counter() - t0
            stage_t[name + "#"] = stage_t.get(name + "#", 0) + 1
            return r
        return wrapped

    for name in ("_triangulate_new_points", "_fuse_neighbors", "_local_ba",
                 "_cull_keyframes", "_try_close_loop", "_mapping_core"):
        setattr(sys_, name, wrap(name, getattr(sys_, name)))
    sys_._jit_cull_inner = sys_._jit_cull
    sys_._jit_cull = wrap("cull_points", sys_._jit_cull)
    sys_._jit_update_stats = wrap("update_stats", sys_._jit_update_stats)
    sys_._jit_covis = wrap("covis", sys_._jit_covis)
    sys_._jit_gather_ba = wrap("ba_gather", sys_._jit_gather_ba)
    sys_._jit_scatter_ba = wrap("ba_scatter", sys_._jit_scatter_ba)
    sys_._jit_lm_chunk = wrap("ba_lm_chunk", sys_._jit_lm_chunk)
    sys_._jit_classify_outliers = wrap("ba_classify", sys_._jit_classify_outliers)
    sys_._jit_triangulate_multi = wrap("tri_multi", sys_._jit_triangulate_multi)
    sys_._jit_fuse_multi = wrap("fuse_multi", sys_._jit_fuse_multi)
    sys_._jit_fuse_masked = wrap("fuse_masked", sys_._jit_fuse_masked)

    n_kf0 = 0
    t0_total = 0.0
    warm = 40
    for i, T in enumerate(poses):
        img, dep = world.render(T, sys_.cam, want_depth=True, noise=2.0,
                                rng=rng)
        if i == warm:
            stage_t.clear()
            n_kf0 = sys_.n_kf
            t0_total = time.perf_counter()
        sys_.track_rgbd(img, dep, i / 30.0)
    t_total = time.perf_counter() - t0_total
    nkf = sys_.n_kf - n_kf0
    print(f"kf inserted after warmup: {nkf}, total wall {t_total:.2f}s, "
          f"n_pt={sys_.n_pt}", flush=True)
    for k in sorted(stage_t):
        if k.endswith("#"):
            continue
        print(f"  {k:26s}: {stage_t[k] / max(nkf, 1) * 1e3:8.1f} ms/kf  "
              f"({stage_t.get(k + '#', 0)} calls)", flush=True)


if __name__ == "__main__":
    main()
