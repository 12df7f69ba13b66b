"""Bisect the fused tracking program: compile truncated variants and time
each in throughput mode.  Finds which stage inflates the fused step beyond
the sum of individually-timed kernels."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from refactored_orb_slam2_tpu.system import SlamSystem, _encode_img, _encode_depth, _decode_img, _decode_depth
from refactored_orb_slam2_tpu.utils.config import (
    CameraConfig, MapConfig, ORBConfig, SystemConfig,
)
from refactored_orb_slam2_tpu.utils import world3d as W
from refactored_orb_slam2_tpu.frontend.frame import build_frame_rgbd
import refactored_orb_slam2_tpu.frontend.tracking_kernels as TK
from refactored_orb_slam2_tpu.optim.pose_opt import optimize_pose
from refactored_orb_slam2_tpu.geometry import se3

DISPATCH = [0.0]


def tput(fn, n=20, warmup=2):
    for _ in range(warmup):
        r = fn()
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1e3 - DISPATCH[0]


def tree_sum(x):
    leaves = jax.tree_util.tree_leaves(x)
    return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)


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
    poses = W.traj_room_orbit(16, seed=5, span=0.12 * np.pi)
    rng = np.random.default_rng(0)
    for i, T in enumerate(poses):
        img, dep = world.render(T, sys_.cam, want_depth=True, noise=2.0, rng=rng)
        sys_.track_rgbd(img, dep, i / 30.0)

    img_np, dep_np = world.render(poses[-1], sys_.cam, want_depth=True,
                                  noise=2.0, rng=rng)
    img = jnp.asarray(_encode_img(img_np))
    dep = jnp.asarray(_encode_depth(dep_np))
    m = sys_.map
    last = sys_.last_frame
    vel = (jnp.asarray(sys_.velocity) if sys_.velocity is not None
           else jnp.eye(4, dtype=jnp.float32))

    triv = jax.jit(lambda x: x + 1)
    for _ in range(5):
        r = triv(jnp.float32(0))
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(100):
        r = triv(jnp.float32(0))
    jax.block_until_ready(r)
    DISPATCH[0] = (time.perf_counter() - t0) / 100 * 1e3

    cam = sys_.cam
    scale_factors = sys_.scale_factors
    inv_sigma2_table = sys_.inv_sigma2_table
    n_levels = cfg.orb.n_levels
    th = 15.0
    th_depth_m = float(sys_.th_depth_m)
    use_pallas = sys_.use_pallas

    def make(stop):
        def step(raw_a, raw_b, last_xy, last_pt, last_octave, last_angle,
                 last_pose, velocity, have_vel, ref_kf, min_obs,
                 kf_pose, kf_valid, kf_point_idx, kf_feat_valid,
                 pt_pos, pt_valid, pt_desc, pt_normal,
                 pt_min_dist, pt_max_dist, pt_visible, pt_found, pt_obs_kf):
            frame = build_frame_rgbd(_decode_img(raw_a), _decode_depth(raw_b),
                                     cam, cfg.orb)
            if stop == "frame":
                return tree_sum(frame)
            pose0 = jnp.where(have_vel, velocity @ last_pose, last_pose)

            def motion(win):
                return TK.match_motion_model(
                    cam, pose0, frame, last_xy, last_pt, last_octave,
                    pt_pos, pt_valid, pt_desc, last_angle,
                    th=win, scale_factors=scale_factors, nn_max_dist=75)

            r1 = motion(th)
            if stop == "motion1":
                return tree_sum(frame) + tree_sum(r1)
            r = jax.lax.cond(r1.n_matches < 20,
                             lambda _: motion(2 * th), lambda _: r1,
                             operand=None)
            if stop == "motion2":
                return tree_sum(frame) + tree_sum(r)
            inv_s2 = jnp.take(inv_sigma2_table,
                              jnp.clip(frame.octave, 0, len(scale_factors) - 1))
            is_st = frame.uvr[:, 2] >= 0
            valid1 = r.pt_idx >= 0
            o1 = optimize_pose(cam, pose0, pt_pos[jnp.clip(r.pt_idx, 0)],
                               frame.uvr, inv_s2, valid1, is_st)
            pt1 = jnp.where(o1.inlier, r.pt_idx, -1)
            if stop == "poseopt1":
                return tree_sum(frame) + tree_sum(o1.Tcw) + tree_sum(pt1)
            P = pt_pos.shape[0]
            scatter_idx = jnp.where(pt1 >= 0, pt1, P)
            already = jnp.zeros(P, bool).at[scatter_idx].set(True, mode="drop")
            local = TK.select_local_points(
                cam, o1.Tcw, pt_pos, pt_valid, pt_normal,
                pt_min_dist, pt_max_dist, already, budget=4096,
                scale_factor=cfg.orb.scale_factor, n_levels=n_levels)
            if stop == "select":
                return tree_sum(frame) + tree_sum(o1.Tcw) + tree_sum(local)
            r2 = TK.match_local_points(frame, local, pt_desc, pt1, th=1.0,
                                       scale_factors=scale_factors,
                                       use_pallas=use_pallas)
            if stop == "matchlocal":
                return tree_sum(frame) + tree_sum(o1.Tcw) + tree_sum(r2)
            valid2 = r2.pt_idx >= 0
            o2 = optimize_pose(cam, o1.Tcw, pt_pos[jnp.clip(r2.pt_idx, 0)],
                               frame.uvr, inv_s2, valid2, is_st)
            pt2 = jnp.where(o2.inlier, r2.pt_idx, -1)
            if stop == "poseopt2":
                return tree_sum(frame) + tree_sum(o2.Tcw) + tree_sum(pt2)
            base = tree_sum(o2.Tcw) + tree_sum(pt2)
            vis_idx = jnp.where(local.idx >= 0, local.idx, P)
            new_visible = pt_visible.at[vis_idx].add(1, mode="drop")
            fnd_idx = jnp.where(pt2 >= 0, pt2, P)
            new_found = pt_found.at[fnd_idx].add(1, mode="drop")
            if stop == "vis":
                return base + tree_sum(new_visible) + tree_sum(new_found)
            close = (frame.depth > 0) & (frame.depth < th_depth_m) & frame.valid
            tracked_close = jnp.sum((close & (pt2 >= 0)).astype(jnp.int32))
            untracked_close = jnp.sum((close & (pt2 < 0)).astype(jnp.int32))
            if stop == "close":
                return base + tracked_close + untracked_close
            n_obs = jnp.sum((pt_obs_kf >= 0).astype(jnp.int32), axis=1)
            ref_pt = kf_point_idx[ref_kf]
            ref_has = ((ref_pt >= 0) & kf_feat_valid[ref_kf]
                       & jnp.take(pt_valid, jnp.clip(ref_pt, 0))
                       & (jnp.take(n_obs, jnp.clip(ref_pt, 0)) >= min_obs))
            ref_tracked = jnp.sum(ref_has.astype(jnp.int32))
            if stop == "refstats":
                return base + ref_tracked
            Tcr = o2.Tcw @ se3.inv(kf_pose[ref_kf])
            scalars = jnp.stack([r.n_matches, o1.n_inliers, o2.n_inliers,
                                 tracked_close, untracked_close,
                                 ref_tracked]).astype(jnp.int32)
            if stop == "notree":
                return (frame.xy, jnp.stack([o2.Tcw, Tcr]), pt2, local.idx,
                        new_visible, new_found, scalars)
            return (tree_sum(frame) + base
                    + tree_sum(scalars) + tree_sum(new_visible)
                    + tree_sum(new_found) + tree_sum(Tcr))
        return jax.jit(step)

    args = (img, dep, last.xy, sys_.last_pt_idx, last.octave, last.angle,
            sys_.last_pose, vel, jnp.asarray(True),
            jnp.int32(sys_.ref_kf), jnp.int32(3),
            m.kf_pose, m.kf_valid, m.kf_point_idx, m.kf_feat_valid,
            m.pt_pos, m.pt_valid, m.pt_desc, m.pt_normal,
            m.pt_min_dist, m.pt_max_dist, m.pt_visible, m.pt_found,
            m.pt_obs_kf)

    stops = ["poseopt2", "vis", "close", "refstats", "notree", "full"]
    prev = 0.0
    for s in stops:
        fn = make(s)
        ms = tput(lambda: fn(*args))
        print(f"  up to {s:11s}: {ms:7.2f} ms  (+{ms - prev:6.2f})", flush=True)
        prev = ms


if __name__ == "__main__":
    main()
