"""Probe the tunneled-chip cost floors that bound pipelined tracking fps.

Measures, independently:
- trivial-dispatch round trip (block every call)      -> latency floor
- trivial-dispatch throughput (back-to-back, 1 sync)  -> dispatch rate floor
- frame upload throughput (uint8 640x480 + uint16)    -> transfer floor
- fused-track throughput (back-to-back, 1 sync)       -> device+dispatch rate
- fused-track + per-frame upload throughput           -> the pipelined floor
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from refactored_orb_slam2_tpu.system import SlamSystem, _encode_img, _encode_depth
from refactored_orb_slam2_tpu.utils.config import (
    CameraConfig, MapConfig, ORBConfig, SystemConfig,
)
from refactored_orb_slam2_tpu.utils import world3d as W


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
        img, dep = world.render(T, sys_.cam, want_depth=True, noise=2.0, rng=rng)
        sys_.track_rgbd(img, dep, i / 30.0)
    print(f"warm: kf={sys_.n_kf} pt={sys_.n_pt} state={sys_.state}")

    img_np, dep_np = world.render(poses[-1], sys_.cam, want_depth=True,
                                  noise=2.0, rng=rng)
    enc_img, enc_dep = _encode_img(img_np), _encode_depth(dep_np)

    # --- trivial dispatch -------------------------------------------------
    triv = jax.jit(lambda x: x + 1)
    jax.block_until_ready(triv(jnp.float32(0)))
    t0 = time.perf_counter()
    for _ in range(50):
        jax.block_until_ready(triv(jnp.float32(0)))
    rtt = (time.perf_counter() - t0) / 50 * 1e3
    t0 = time.perf_counter()
    r = None
    for _ in range(200):
        r = triv(jnp.float32(0))
    jax.block_until_ready(r)
    disp = (time.perf_counter() - t0) / 200 * 1e3
    print(f"trivial: blocked RTT {rtt:.2f} ms, back-to-back {disp:.3f} ms")

    # --- device_get of small packed outputs ------------------------------
    small = jnp.zeros((2, 4, 4), jnp.float32)
    jax.block_until_ready(small)
    t0 = time.perf_counter()
    for _ in range(50):
        jax.device_get((small, small[0, 0, :2].astype(jnp.int32)))
    get2 = (time.perf_counter() - t0) / 50 * 1e3
    print(f"device_get 2 leaves: {get2:.2f} ms")

    # --- frame upload ------------------------------------------------------
    for blocked in (True, False):
        n = 40
        t0 = time.perf_counter()
        hold = []
        for _ in range(n):
            a = jax.device_put(enc_img)
            b = jax.device_put(enc_dep)
            if blocked:
                jax.block_until_ready((a, b))
            else:
                hold.append((a, b))
        jax.block_until_ready(hold[-1] if hold else (a, b))
        up = (time.perf_counter() - t0) / n * 1e3
        mb = (enc_img.nbytes + enc_dep.nbytes) / 1e6
        print(f"frame upload ({mb:.2f} MB) {'blocked' if blocked else 'pipelined'}: "
              f"{up:.2f} ms/frame = {mb / up * 1e3:.0f} MB/s")

    # --- fused-track throughput -------------------------------------------
    raw_a, raw_b = jnp.asarray(enc_img), jnp.asarray(enc_dep)

    def once(upload):
        a = jnp.asarray(enc_img) if upload else raw_a
        b = jnp.asarray(enc_dep) if upload else raw_b
        return sys_._dispatch_fused(a, b, 0.0)

    for upload in (False, True):
        for _ in range(3):
            rec = once(upload)
        jax.block_until_ready(rec["sc"])
        n = 30
        t0 = time.perf_counter()
        for _ in range(n):
            rec = once(upload)
        jax.block_until_ready(rec["sc"])
        ms = (time.perf_counter() - t0) / n * 1e3
        print(f"fused dispatch throughput (upload={upload}): {ms:.2f} ms/frame")

    # --- host-side encode cost --------------------------------------------
    t0 = time.perf_counter()
    for _ in range(50):
        _encode_img(img_np), _encode_depth(dep_np)
    print(f"host encode: {(time.perf_counter() - t0) / 50 * 1e3:.2f} ms/frame")


if __name__ == "__main__":
    main()
