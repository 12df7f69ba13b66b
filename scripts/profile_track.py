"""Profile the fused per-frame tracking program and its stages on the real
chip (run without JAX_PLATFORMS so the tunneled TPU is used).

Reports wall time for: trivial dispatch round trip, host->device upload of
one frame, the full fused step (device compute), device_get of the two
per-frame output leaves, and the decomposed sub-stages (frame build / ORB
extraction / motion match / pose opt / local select / local match).
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


def timeit_pipelined(fn, n=20, warmup=3):
    """Throughput timing: dispatches overlap, only the last is awaited."""
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
    poses = W.traj_room_orbit(16, seed=5, span=0.12 * np.pi)
    rng = np.random.default_rng(0)
    for i, T in enumerate(poses):
        img, dep = world.render(T, sys_.cam, want_depth=True, noise=2.0,
                                rng=rng)
        sys_.track_rgbd(img, dep, i / 30.0)
    print(f"warm: kf={sys_.n_kf} pt={sys_.n_pt} state={sys_.state}")

    img_np, dep_np = world.render(poses[-1], sys_.cam, want_depth=True,
                                  noise=2.0, rng=rng)
    from refactored_orb_slam2_tpu.system import _encode_img, _encode_depth
    img = jnp.asarray(_encode_img(img_np))
    dep = jnp.asarray(_encode_depth(dep_np))
    m = sys_.map
    last = sys_.last_frame
    vel = (jnp.asarray(sys_.velocity) if sys_.velocity is not None
           else jnp.eye(4, dtype=jnp.float32))

    # dispatch overhead: trivial program
    triv = jax.jit(lambda x: x + 1)
    _ = triv(jnp.float32(0))
    print(f"dispatch+sync (trivial jit): {timeit(lambda: triv(jnp.float32(0)), n=50):.2f} ms")
    print(f"dispatch only (trivial jit): {timeit_pipelined(lambda: triv(jnp.float32(0)), n=50):.2f} ms")

    # upload: one frame's raw arrays
    def upload():
        a = jax.device_put(_encode_img(img_np))
        b = jax.device_put(_encode_depth(dep_np))
        return a, b
    print(f"frame upload (img+depth): {timeit(upload, n=20):.2f} ms")

    min_obs = jnp.int32(3)
    def fused():
        return sys_._jit_fused_track(
            img, dep, last.xy, sys_.last_pt_idx, last.octave, last.angle,
            sys_.last_pose, vel, jnp.asarray(True),
            jnp.int32(sys_.ref_kf), min_obs,
            m.kf_pose, m.kf_valid, m.kf_point_idx, m.kf_feat_valid,
            m.pt_pos, m.pt_valid, m.pt_desc, m.pt_normal,
            m.pt_min_dist, m.pt_max_dist, m.pt_visible, m.pt_found,
            m.pt_obs_kf,
        )
    print(f"fused track step (sync): {timeit(fused, n=20):.2f} ms")
    print(f"fused track step (pipelined): {timeit_pipelined(fused, n=20):.2f} ms")

    out = fused()
    jax.block_until_ready(out)
    poses_out, sc = out[1], out[6]
    def get2():
        return jax.device_get((poses_out, sc))
    print(f"device_get 2 leaves: {timeit(get2, n=30):.2f} ms")

    # frame build alone
    print(f"frame build (ORB extract + rgbd): {timeit(lambda: sys_._jit_frame(img, dep), n=20):.2f} ms")

    frame = sys_._jit_frame(img, dep)
    jax.block_until_ready(frame)

    from refactored_orb_slam2_tpu.ops.orb import extract_orb
    jit_ex = jax.jit(lambda im: extract_orb(
        im.astype(jnp.float32), n_features=cfg.orb.n_features,
        n_levels=cfg.orb.n_levels, scale_factor=cfg.orb.scale_factor))
    print(f"  extract_orb alone: {timeit(lambda: jit_ex(img), n=20):.2f} ms")

    import refactored_orb_slam2_tpu.frontend.tracking_kernels as TK
    jit_mm = jax.jit(lambda pose: TK.match_motion_model(
        sys_.cam, pose, frame, last.xy, sys_.last_pt_idx, last.octave,
        m.pt_pos, m.pt_valid, m.pt_desc, last.angle,
        th=15.0, scale_factors=sys_.scale_factors, nn_max_dist=75))
    print(f"motion match: {timeit(lambda: jit_mm(sys_.last_pose), n=20):.2f} ms")

    inv_s2 = jnp.take(sys_.inv_sigma2_table,
                      jnp.clip(frame.octave, 0, cfg.orb.n_levels - 1))
    pt_idx = sys_.last_pt_idx
    valid = pt_idx >= 0
    pw = m.pt_pos[jnp.clip(pt_idx, 0)]
    is_st = frame.uvr[:, 2] >= 0
    print(f"pose opt (4x10 LM): {timeit(lambda: sys_._jit_pose_opt(sys_.cam, sys_.last_pose, pw, frame.uvr, inv_s2, valid, is_st), n=20):.2f} ms")

    P = m.pt_pos.shape[0]
    already = jnp.zeros(P, bool)
    jit_sel = jax.jit(lambda pose: TK.select_local_points(
        sys_.cam, pose, m.pt_pos, m.pt_valid, m.pt_normal,
        m.pt_min_dist, m.pt_max_dist, already, budget=4096,
        scale_factor=cfg.orb.scale_factor, n_levels=cfg.orb.n_levels))
    print(f"select local points (top_k {P}): {timeit(lambda: jit_sel(sys_.last_pose), n=20):.2f} ms")

    local = jit_sel(sys_.last_pose)
    jax.block_until_ready(local)
    jit_ml = jax.jit(lambda fr, lc: TK.match_local_points(
        fr, lc, m.pt_desc, pt_idx, th=1.0,
        scale_factors=sys_.scale_factors, use_pallas=sys_.use_pallas))
    print(f"match local (pallas={sys_.use_pallas}): {timeit(lambda: jit_ml(frame, local), n=20):.2f} ms")


if __name__ == "__main__":
    main()
