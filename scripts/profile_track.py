"""Profile the fused per-frame tracking program and its stages on the real
chip (run without JAX_PLATFORMS so the tunneled TPU is used).

Reports wall time for: full fused step, frame build, motion match, pose opt,
local select, local match, dispatch overhead (trivial program).
"""

import os
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


def timeit(fn, n=20, warmup=3):
    for _ in range(warmup):
        r = fn()
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1e3  # ms


def main():
    print("devices:", jax.devices())
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
    for _ in range(12):
        traj.append(step @ traj[-1])
    frames = [(world.render(T, sys_.cam, noise=2.0, rng=rng),
               world.render_depth(T, sys_.cam)) for T in traj]

    # initialize + a few frames so the map is warm
    for i, (img, d) in enumerate(frames):
        sys_.track_rgbd(img, d, i / 30.0)
    print(f"warm: kf={sys_.n_kf} pt={sys_.n_pt} state={sys_.state}")

    img, dep = jnp.asarray(frames[-1][0]), jnp.asarray(frames[-1][1])
    m = sys_.map
    last = sys_.last_frame
    vel = jnp.asarray(sys_.velocity) if sys_.velocity is not None else jnp.eye(4, dtype=jnp.float32)

    # dispatch overhead: trivial program
    triv = jax.jit(lambda x: x + 1)
    _ = triv(jnp.float32(0))
    t_disp = timeit(lambda: triv(jnp.float32(0)), n=50)
    print(f"dispatch overhead (trivial jit): {t_disp:.2f} ms")

    # full fused step
    def fused():
        return sys_._jit_fused_track(
            img, dep, last.xy, sys_.last_pt_idx, last.octave, last.angle,
            sys_.last_pose, vel, jnp.asarray(True), jnp.int32(sys_.ref_kf),
            m.kf_pose, m.pt_pos, m.pt_valid, m.pt_desc, m.pt_normal,
            m.pt_min_dist, m.pt_max_dist, m.pt_visible, m.pt_found,
        )
    t_fused = timeit(fused, n=20)
    print(f"fused track step: {t_fused:.2f} ms")

    # frame build alone
    t_frame = timeit(lambda: sys_._jit_frame(img, dep), n=20)
    print(f"frame build (ORB extract + rgbd): {t_frame:.2f} ms")

    frame = sys_._jit_frame(img, dep)

    # extraction sub-stages
    from refactored_orb_slam2_tpu.ops.orb import extract_orb
    jit_ex = jax.jit(lambda im: extract_orb(
        im, n_features=cfg.orb.n_features, n_levels=cfg.orb.n_levels,
        scale_factor=cfg.orb.scale_factor))
    t_ex = timeit(lambda: jit_ex(img), n=20)
    print(f"  extract_orb alone: {t_ex:.2f} ms")

    # motion match
    t_mm = timeit(lambda: sys_._jit_motion_match(
        sys_.cam, sys_.last_pose, frame, last.xy, sys_.last_pt_idx,
        last.octave, m.pt_pos, m.pt_valid, m.pt_desc, last.angle,
        th=7.0, scale_factors=sys_.scale_factors, nn_max_dist=75), n=20)
    print(f"motion match: {t_mm:.2f} ms")

    # pose opt
    inv_s2 = jnp.take(sys_.inv_sigma2_table,
                      jnp.clip(frame.octave, 0, cfg.orb.n_levels - 1))
    pt_idx = sys_.last_pt_idx
    valid = pt_idx >= 0
    pw = m.pt_pos[jnp.clip(pt_idx, 0)]
    is_st = frame.uvr[:, 2] >= 0
    t_po = timeit(lambda: sys_._jit_pose_opt(
        sys_.cam, sys_.last_pose, pw, frame.uvr, inv_s2, valid, is_st), n=20)
    print(f"pose opt (4x10 LM): {t_po:.2f} ms")

    # local select
    P = m.pt_pos.shape[0]
    already = jnp.zeros(P, bool)
    t_sel = timeit(lambda: sys_._jit_select_local(
        sys_.cam, sys_.last_pose, m.pt_pos, m.pt_valid, m.pt_normal,
        m.pt_min_dist, m.pt_max_dist, already, budget=4096,
        scale_factor=cfg.orb.scale_factor, n_levels=cfg.orb.n_levels), n=20)
    print(f"select local points (top_k {P}): {t_sel:.2f} ms")

    local = sys_._jit_select_local(
        sys_.cam, sys_.last_pose, m.pt_pos, m.pt_valid, m.pt_normal,
        m.pt_min_dist, m.pt_max_dist, already, budget=4096,
        scale_factor=cfg.orb.scale_factor, n_levels=cfg.orb.n_levels)
    t_ml = timeit(lambda: sys_._jit_match_local(
        frame, local, m.pt_desc, pt_idx, th=1.0,
        scale_factors=sys_.scale_factors, use_pallas=sys_.use_pallas), n=20)
    print(f"match local (pallas={sys_.use_pallas}): {t_ml:.2f} ms")


if __name__ == "__main__":
    main()
