"""Phase bisection of fuse_into_keyframe on real map state.

    python scripts/profile_fuse.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from refactored_orb_slam2_tpu.system import SlamSystem
from refactored_orb_slam2_tpu.backend import local_mapping as LM
from refactored_orb_slam2_tpu.geometry import se3
from refactored_orb_slam2_tpu.ops.descriptors import hamming
from refactored_orb_slam2_tpu.ops import matching as M
from refactored_orb_slam2_tpu.models.map_state import (
    n_observations, predict_scale,
)
from refactored_orb_slam2_tpu.utils.config import (
    CameraConfig, MapConfig, ORBConfig, SystemConfig,
)
from refactored_orb_slam2_tpu.utils import world3d as W


def tput(name, fn, *a, n=12):
    r = fn(*a)
    jax.block_until_ready(jax.tree_util.tree_leaves(r))
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*a)
    jax.block_until_ready(jax.tree_util.tree_leaves(r))
    print(f"  {name:34s}: {(time.perf_counter() - t0) / n * 1e3:8.3f} ms",
          flush=True)


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
    sys_ = SlamSystem(cfg, pipelined=True, pipeline_depth=3)
    world = W.scene_room(seed=11)
    poses = W.traj_room_orbit(60, seed=5, span=0.9 * np.pi)
    rng = np.random.default_rng(0)
    for i, T in enumerate(poses):
        img, dep = world.render_device(T, sys_.cam, want_depth=True,
                                       noise=2.0, rng=rng)
        sys_.track_rgbd_device(img, dep, i / 30.0)
    sys_.flush_pipeline()
    print(f"warm: kf={sys_.n_kf} pt={sys_.n_pt}")
    state = sys_.map
    cam = sys_.cam
    kf_slot = jnp.int32(sys_.n_kf - 1)
    cand_idx = state.kf_point_idx[kf_slot]
    scale_factor, n_levels = cfg.orb.scale_factor, cfg.orb.n_levels
    th, max_dist = 3.0, 50
    K, N, P, O = state.capacity

    def phase_a(state, kf_slot, cand_idx):
        """candidate gating (cand_idx path)"""
        Tcw = state.kf_pose[kf_slot]
        ci = jnp.clip(cand_idx, 0)
        row_ok = cand_idx >= 0
        observed_here = (
            jnp.any(state.pt_obs_kf[ci] == kf_slot, axis=1) | ~row_ok
        )
        pos = state.pt_pos[ci]
        pt_valid_c = state.pt_valid[ci] & row_ok
        normal_c = state.pt_normal[ci]
        min_d_c, max_d_c = state.pt_min_dist[ci], state.pt_max_dist[ci]
        pc = se3.transform(Tcw, pos)
        z = pc[:, 2]
        z_ok = z > 1e-3
        z_safe = jnp.where(z_ok, z, 1.0)
        u = cam.fx * pc[:, 0] / z_safe + cam.cx
        v = cam.fy * pc[:, 1] / z_safe + cam.cy
        in_img = (u >= 0) & (u < cam.width) & (v >= 0) & (v < cam.height)
        Twc = se3.inv(Tcw)
        center = se3.translation(Twc)
        po = pos - center
        dist = jnp.linalg.norm(po, axis=-1)
        dist_ok = (dist >= 0.8 * min_d_c) & (dist <= 1.2 * max_d_c)
        view_cos = jnp.sum(po * normal_c, axis=-1) / jnp.maximum(dist, 1e-9)
        ok = (pt_valid_c & z_ok & in_img & dist_ok & (view_cos > 0.5)
              & ~observed_here)
        return ok, dist, max_d_c, u, v, ci

    def phase_b(state, kf_slot, cand_idx):
        """+ scale prediction, window/octave masks, hamming, nn_match"""
        ok, dist, maxd, u, v, ci = phase_a(state, kf_slot, cand_idx)
        pred = predict_scale(dist, maxd, scale_factor, n_levels)
        uv = jnp.stack([u, v], axis=-1)
        sf = jnp.asarray([scale_factor ** i for i in range(n_levels)],
                         jnp.float32)
        radius = th * jnp.take(sf, jnp.clip(pred, 0, n_levels - 1))
        geo = M.window_mask(uv, state.kf_xy[kf_slot], radius)
        geo = geo & M.octave_band_mask(pred, state.kf_octave[kf_slot], -1, 1)
        dmat = hamming(state.pt_desc[ci], state.kf_desc[kf_slot])
        res = M.nn_match(dmat, row_valid=ok,
                         col_valid=state.kf_feat_valid[kf_slot],
                         extra_mask=geo, max_dist=max_dist)
        res = M.resolve_duplicates(res, N)
        return res.idx, res.mask

    full = lambda s, k, c: LM.fuse_into_keyframe(
        s, k, cam, None, budget=1024, scale_factor=scale_factor,
        n_levels=n_levels, th=th, max_dist=max_dist, cand_idx=c,
    )

    tput("phase A (gating)", jax.jit(phase_a), state, kf_slot, cand_idx)
    tput("phase A+B (matching)", jax.jit(phase_b), state, kf_slot, cand_idx)
    tput("full fuse (cand_idx)", jax.jit(full), state, kf_slot, cand_idx)


if __name__ == "__main__":
    main()
