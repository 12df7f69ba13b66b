"""Throughput-mode profile of the keyframe-rate mapping programs.

profile_mapping.py measures SYNC wall per stage (includes every tunnel
round trip).  This one separates device compute from dispatch/sync: each
jitted program is re-run back-to-back on captured real inputs with a
single final block, giving per-call device time.  The loop-closing host
stages (BoW detect, Sim3 candidates) are timed individually.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from refactored_orb_slam2_tpu.system import SlamSystem
from refactored_orb_slam2_tpu.backend import loop_closing as LC
from refactored_orb_slam2_tpu.utils.config import (
    CameraConfig, MapConfig, ORBConfig, SystemConfig,
)
from refactored_orb_slam2_tpu.utils import world3d as W


def tput(name, fn, n=8):
    r = fn()
    jax.block_until_ready(jax.tree_util.tree_leaves(r))
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    jax.block_until_ready(jax.tree_util.tree_leaves(r))
    ms = (time.perf_counter() - t0) / n * 1e3
    print(f"  {name:28s}: {ms:8.2f} ms/call (device, back-to-back)",
          flush=True)
    return ms


def main():
    H, Wd = 480, 640
    cfg = SystemConfig(
        sensor="rgbd",
        camera=CameraConfig(fx=517.3, fy=516.5, cx=318.6, cy=255.3, bf=40.0,
                            width=Wd, height=H, fps=30),
        orb=ORBConfig(n_features=1000, n_levels=8),
        map=MapConfig(max_keyframes=512, max_points=65536, max_obs_per_point=32),
    )
    sys_ = SlamSystem(cfg, pipelined=True, pipeline_depth=3)
    world = W.scene_room(seed=11)
    poses = W.traj_room_orbit(120, seed=5, span=0.9 * np.pi)
    rng = np.random.default_rng(0)

    # instrument the loop-closing host stages during the warm drive
    t_detect = [0.0, 0]
    t_sim3 = [0.0, 0]
    t_covis_dl = [0.0, 0]
    orig_detect = LC.detect
    orig_sim3 = LC.compute_sim3

    def timed_detect(*a, **k):
        t0 = time.perf_counter()
        r = orig_detect(*a, **k)
        t_detect[0] += time.perf_counter() - t0
        t_detect[1] += 1
        return r

    def timed_sim3(*a, **k):
        t0 = time.perf_counter()
        r = orig_sim3(*a, **k)
        t_sim3[0] += time.perf_counter() - t0
        t_sim3[1] += 1
        return r

    LC.detect = timed_detect
    LC.compute_sim3 = timed_sim3

    orig_close = sys_._try_close_loop
    t_close = [0.0, 0]

    def timed_close(kf):
        t0 = time.perf_counter()
        r = orig_close(kf)
        t_close[0] += time.perf_counter() - t0
        t_close[1] += 1
        return r

    sys_._try_close_loop = timed_close

    for i, T in enumerate(poses):
        img, dep = world.render_device(T, sys_.cam, want_depth=True,
                                       noise=2.0, rng=rng)
        sys_.track_rgbd_device(img, dep, i / 30.0)
    sys_.flush_pipeline()
    print(f"warm: kf={sys_.n_kf} pt={sys_.n_pt}")
    for nm, t in (("_try_close_loop", t_close), ("LC.detect", t_detect),
                  ("LC.compute_sim3", t_sim3)):
        if t[1]:
            print(f"  {nm:28s}: {t[0] / t[1] * 1e3:8.2f} ms/call "
                  f"({t[1]} calls)")

    # ---- throughput timing of the jitted programs on real state ----------
    m = sys_.map
    kf_slot = sys_.n_kf - 1
    print("\njitted program device times:")
    tput("covis", lambda: sys_._jit_covis(m))
    covis = np.asarray(sys_._jit_covis(m))
    row = covis[kf_slot]
    window = np.zeros(row.shape[0], bool)
    window[kf_slot] = True
    nb = np.argsort(-row)[:20]
    window[nb[row[nb] > 0]] = True
    window[0] = False
    wm = jnp.asarray(window)
    fm = jnp.asarray(~window) & m.kf_valid
    mcfg = cfg.map
    tput("gather_ba", lambda: sys_._jit_gather_ba(
        m, wm, fm, sys_.inv_sigma2_table,
        max_kfs=mcfg.local_ba_max_kfs, max_points=mcfg.local_ba_max_points,
        max_obs=mcfg.local_ba_max_obs))
    prob, kf_sel, pt_sel, obs_sel, n_pt_in = sys_._jit_gather_ba(
        m, wm, fm, sys_.inv_sigma2_table,
        max_kfs=mcfg.local_ba_max_kfs, max_points=mcfg.local_ba_max_points,
        max_obs=mcfg.local_ba_max_obs)
    lam = jnp.float32(1e-4)
    tput("lm_chunk dense x5", lambda: sys_._jit_lm_chunk(
        sys_.cam, prob, prob.kf_poses, prob.points, lam,
        n_iters=5, use_huber=True, solver="dense", n_cg=0))
    tput("classify_outliers", lambda: sys_._jit_classify_outliers(
        sys_.cam, prob, prob.kf_poses, prob.points))
    res_poses, res_points, _ = sys_._jit_lm_chunk(
        sys_.cam, prob, prob.kf_poses, prob.points, lam,
        n_iters=1, use_huber=True, solver="dense", n_cg=0)
    ov = sys_._jit_classify_outliers(sys_.cam, prob, prob.kf_poses, prob.points)
    tput("scatter_ba", lambda: sys_._jit_scatter_ba(
        m, prob, kf_sel, pt_sel, obs_sel, res_poses, res_points, ov))

    cur_pt = m.kf_point_idx[kf_slot]
    P = m.pt_pos.shape[0]
    scatter = jnp.where(cur_pt >= 0, cur_pt, P)
    cur_mask = jnp.zeros(P, bool).at[scatter].set(True, mode="drop") & m.pt_valid
    slots = np.full(60, -1, np.int32)
    tgt = [int(i) for i in np.argsort(-row)[:10] if row[i] > 0]
    slots[:len(tgt)] = tgt
    tput("fuse_multi (60 tgt)", lambda: sys_._jit_fuse_multi(
        m, jnp.asarray(slots), sys_.cam, cur_mask,
        budget=1024, scale_factor=cfg.orb.scale_factor,
        n_levels=cfg.orb.n_levels))
    tgt_kf = np.zeros(m.kf_pose.shape[0], bool)
    tgt_kf[tgt] = True
    obs_in_tgt = jnp.take(jnp.asarray(tgt_kf), jnp.clip(m.pt_obs_kf, 0)) & (
        m.pt_obs_kf >= 0)
    tgt_mask = m.pt_valid & jnp.any(obs_in_tgt, axis=1)
    tput("fuse_masked", lambda: sys_._jit_fuse_masked(
        m, jnp.int32(kf_slot), sys_.cam, tgt_mask,
        budget=2048, scale_factor=cfg.orb.scale_factor,
        n_levels=cfg.orb.n_levels))
    neighbors = np.full(10, -1, np.int32)
    sel = np.argsort(-row)[:10]
    sel = sel[row[sel] > 15]
    neighbors[:len(sel)] = sel
    tput("triangulate_multi", lambda: sys_._jit_triangulate_multi(
        m, jnp.int32(kf_slot), jnp.asarray(neighbors), sys_.cam,
        jnp.int32(sys_.n_pt), max_new=64,
        scale_factor=cfg.orb.scale_factor, n_levels=cfg.orb.n_levels,
        min_baseline_ratio=0.005)[0])
    tput("cull_points", lambda: sys_._jit_cull(m, jnp.int32(kf_slot)))
    tput("cull_recent", lambda: sys_._jit_cull_recent(
        m, jnp.int32(kf_slot), jnp.int32(sys_.n_pt)))
    tput("update_stats", lambda: sys_._jit_update_stats(
        m, scale_factor=cfg.orb.scale_factor, n_levels=cfg.orb.n_levels))
    tput("kf_redundancy_batch", lambda: sys_._jit_kf_redundancy_batch(
        m, jnp.asarray(np.arange(8, dtype=np.int32))))
    tput("update_stats_subset", lambda: sys_._jit_update_stats_subset(
        m, m.kf_point_idx[kf_slot],
        scale_factor=cfg.orb.scale_factor, n_levels=cfg.orb.n_levels))
    # production direction-1 fuse: compact cand_idx path at t_cap slots
    nn = 10
    t_cap = 3 * nn + 2
    slots_prod = np.full(t_cap, -1, np.int32)
    slots_prod[:len(tgt)] = tgt
    cur_pt = m.kf_point_idx[kf_slot]
    tput("fuse_multi prod (cand_idx)", lambda: sys_._jit_fuse_multi(
        m, jnp.asarray(slots_prod), sys_.cam, None,
        budget=1024, scale_factor=cfg.orb.scale_factor,
        n_levels=cfg.orb.n_levels, cand_idx=cur_pt))


if __name__ == "__main__":
    main()
