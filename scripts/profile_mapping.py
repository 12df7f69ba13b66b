"""Profile the keyframe-rate mapping pipeline per stage on the real chip."""

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
from refactored_orb_slam2_tpu.utils.synthetic import SyntheticWorld
from refactored_orb_slam2_tpu.geometry import se3


def main():
    H, W = 480, 640
    cfg = SystemConfig(
        sensor="rgbd",
        camera=CameraConfig(fx=517.3, fy=516.5, cx=318.6, cy=255.3, bf=40.0,
                            width=W, height=H, fps=30),
        orb=ORBConfig(n_features=1000, n_levels=8),
        map=MapConfig(max_keyframes=512, max_points=65536, max_obs_per_point=32),
    )
    sys_ = SlamSystem(cfg)
    world = SyntheticWorld.create(seed=0, n_points=900, x_range=(-8, 8),
                                  y_range=(-4, 4), z_range=(2.5, 20.0),
                                  clear_tube=0.0)
    rng = np.random.default_rng(0)
    step = np.asarray(se3.exp(jnp.asarray([0.04, 0, 0.01, 0, 0.004, 0], jnp.float32)))
    traj = [np.eye(4, dtype=np.float32)]
    for _ in range(48):
        traj.append(step @ traj[-1])

    stage_t = {}
    orig = {}

    def wrap(name, fn):
        def wrapped(*a, **k):
            t0 = time.perf_counter()
            r = fn(*a, **k)
            jax.block_until_ready(jax.tree_util.tree_leaves(r)[0]) if r is not None else None
            stage_t[name] = stage_t.get(name, 0.0) + time.perf_counter() - t0
            stage_t[name + "#"] = stage_t.get(name + "#", 0) + 1
            return r
        return wrapped

    for name in ("_triangulate_new_points", "_fuse_neighbors", "_local_ba",
                 "_cull_keyframes"):
        orig[name] = getattr(sys_, name)
        setattr(sys_, name, wrap(name, orig[name]))
    sys_._jit_cull_w = sys_._jit_cull
    sys_._jit_cull = wrap("cull_points", sys_._jit_cull)
    sys_._jit_update_stats = wrap("update_stats", sys_._jit_update_stats)
    sys_._jit_covis = wrap("covis", sys_._jit_covis)
    sys_._jit_fuse = wrap("fuse_call", sys_._jit_fuse)
    sys_._jit_fuse_masked = sys_._jit_fuse
    sys_._jit_triangulate = wrap("tri_call", sys_._jit_triangulate)

    n_kf0 = 0
    t_total = 0.0
    for i, T in enumerate(traj):
        img = world.render(T, sys_.cam, noise=2.0, rng=rng)
        dep = world.render_depth(T, sys_.cam)
        if i == 20:
            stage_t.clear()
            n_kf0 = sys_.n_kf
            t_total = time.perf_counter()
        sys_.track_rgbd(img, dep, i / 30.0)
    t_total = time.perf_counter() - t_total
    nkf = sys_.n_kf - n_kf0
    print(f"kf inserted after warmup: {nkf}, total wall {t_total:.2f}s")
    for k in sorted(stage_t):
        if k.endswith("#"):
            continue
        print(f"  {k}: {stage_t[k]/max(nkf,1)*1e3:8.1f} ms/kf  "
              f"({stage_t.get(k+'#',0)} calls)")


if __name__ == "__main__":
    main()
