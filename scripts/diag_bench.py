"""Per-frame diagnostic of the bench scenario (billboard world, RGB-D, chip)."""

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
    # TUM fr1/desk-scale world: content 0.8-5 m, handheld-speed motion,
    # so the TUM camera's close-point threshold (ThDepth*bf/fx = 2.7 m)
    # behaves as it does on the real dataset
    world = SyntheticWorld.create(seed=0, n_points=1400, x_range=(-3.0, 4.5),
                                  y_range=(-1.6, 1.6), z_range=(0.8, 5.0),
                                  clear_tube=0.0, size_range=(0.04, 0.13))
    rng = np.random.default_rng(0)
    step = np.asarray(se3.exp(jnp.asarray([0.02, 0, 0.004, 0, 0.003, 0], jnp.float32)))
    traj = [np.eye(4, dtype=np.float32)]
    for _ in range(79):
        traj.append(step @ traj[-1])

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
    for i, T in enumerate(traj):
        img = world.render(T, sys_.cam, noise=2.0, rng=rng)
        dep = world.render_depth(T, sys_.cam)
        last_sc["sc"] = None
        st0 = sys_.state
        t0 = time.perf_counter()
        pose = sys_.track_rgbd(img, dep, i / 30.0)
        dt = (time.perf_counter() - t0) * 1e3
        ok = pose is not None
        if not ok:
            lost += 1
        sc = last_sc["sc"]
        td = last_sc.get("t_dispatch", 0.0)
        ts_ = last_sc.get("t_sync", 0.0)
        print(f"f{i:3d} st={st0}->{sys_.state} ok={int(ok)} kf={sys_.n_kf} "
              f"pt={sys_.n_pt} t={dt:6.1f}ms disp={td:5.1f} sync={ts_:6.1f} "
              + (f"mot={sc['n_motion']} inl1={sc['n_inl1']} map={sc['n_map_inliers']}"
                 if sc else ""), flush=True)
    print(f"lost={lost} stats={sys_.stats}")


if __name__ == "__main__":
    main()
