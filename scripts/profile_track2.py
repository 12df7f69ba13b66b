"""Fine-grained device-compute profile of the fused tracking step.

Unlike profile_track.py (sync timing, dominated by the ~25 ms tunnel round
trip), every stage here is timed in THROUGHPUT mode: n dispatches enqueued
back-to-back, one final block, minus the measured dispatch-only cost.  That
isolates actual device compute — the number that bounds pipelined fps.
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
from refactored_orb_slam2_tpu.ops import image as image_ops
from refactored_orb_slam2_tpu.ops import fast as fast_ops
from refactored_orb_slam2_tpu.ops import orb as orb_ops
import refactored_orb_slam2_tpu.frontend.tracking_kernels as TK

DISPATCH_MS = [0.0]


def tput(fn, n=30, warmup=3):
    """Per-call device time: back-to-back dispatch, single final sync."""
    for _ in range(warmup):
        r = fn()
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    jax.block_until_ready(r)
    ms = (time.perf_counter() - t0) / n * 1e3
    return ms - DISPATCH_MS[0]


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
    img = jnp.asarray(_encode_img(img_np))
    dep = jnp.asarray(_encode_depth(dep_np))
    m = sys_.map
    last = sys_.last_frame
    vel = (jnp.asarray(sys_.velocity) if sys_.velocity is not None
           else jnp.eye(4, dtype=jnp.float32))

    triv = jax.jit(lambda x: x + 1)
    _ = triv(jnp.float32(0))
    for _ in range(5):
        r = triv(jnp.float32(0))
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(100):
        r = triv(jnp.float32(0))
    jax.block_until_ready(r)
    DISPATCH_MS[0] = (time.perf_counter() - t0) / 100 * 1e3
    print(f"dispatch-only baseline: {DISPATCH_MS[0]:.2f} ms (subtracted below)")

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
    print(f"FUSED STEP total:            {tput(fused):7.2f} ms")

    # --- frame build -------------------------------------------------------
    print(f"frame build (rgbd):          {tput(lambda: sys_._jit_frame(img, dep)):7.2f} ms")
    o = cfg.orb
    jit_ex = jax.jit(lambda im: orb_ops.extract_orb(
        im.astype(jnp.float32), n_features=o.n_features, n_levels=o.n_levels,
        scale_factor=o.scale_factor))
    print(f"  extract_orb:               {tput(lambda: jit_ex(img)):7.2f} ms")

    imf = img.astype(jnp.float32)
    n_levels, sfac = o.n_levels, o.scale_factor
    jit_pyr = jax.jit(lambda im: image_ops.build_pyramid(im, n_levels, sfac))
    print(f"    pyramid build:           {tput(lambda: jit_pyr(imf)):7.2f} ms")
    pyr = jit_pyr(imf)
    jax.block_until_ready(pyr)
    jit_blur = jax.jit(lambda ps: [image_ops.gaussian_blur(p, 7, 2.0) for p in ps])
    print(f"    blur all levels:         {tput(lambda: jit_blur(pyr)):7.2f} ms")
    jit_fast = jax.jit(lambda ps: [fast_ops.fast_score(p) for p in ps])
    print(f"    FAST score all levels:   {tput(lambda: jit_fast(pyr)):7.2f} ms")

    quotas = orb_ops.level_quotas(o.n_features, n_levels, sfac)
    jit_det = jax.jit(lambda ps: [
        orb_ops._detect_level(ps[lv], quotas[lv], 20.0, 7.0)
        for lv in range(n_levels)])
    print(f"    detect (FAST+NMS+topk):  {tput(lambda: jit_det(pyr)):7.2f} ms")

    # descriptor tail = extract - detect - pyramid (approx; includes slabs,
    # moments, brief einsum, pack)
    from refactored_orb_slam2_tpu.ops.stereo import stack_pyramid

    def desc_tail(ps):
        blur = [image_ops.gaussian_blur(p, 7, 2.0) for p in ps]
        stack_blur, offsets = stack_pyramid(blur)
        stack_raw, _ = stack_pyramid(ps)
        outs = [orb_ops._detect_level(ps[lv], quotas[lv], 20.0, 7.0)
                for lv in range(n_levels)]
        xs_all = jnp.concatenate([ot[1] for ot in outs])
        ys_all = jnp.concatenate([ot[0] + jnp.int32(int(offsets[lv]))
                                  for lv, ot in enumerate(outs)])
        P = orb_ops.PATCH
        PR = orb_ops.PATCH_R

        def slab(st, y, x):
            return jax.lax.dynamic_slice(st, (y - PR, x - PR), (P, P))
        n = xs_all.shape[0]
        patches_raw = jax.vmap(lambda y, x: slab(stack_raw, y, x))(
            ys_all, xs_all).reshape(n, P * P)
        moments = patches_raw @ jnp.asarray(orb_ops._ic_angle_weights())
        angle = jnp.degrees(jnp.arctan2(moments[:, 1], moments[:, 0]))
        angle = jnp.where(angle < 0, angle + 360.0, angle)
        patches = jax.vmap(lambda y, x: slab(stack_blur, y, x))(
            ys_all, xs_all).reshape(n, P * P)
        Wsel = jnp.asarray(orb_ops._brief_selection_mats())
        diff = jnp.einsum("nk,bkj->bnj", patches, Wsel,
                          preferred_element_type=jnp.float32)
        bin_id = jnp.round(angle / (360.0 / 32)).astype(jnp.int32) % 32
        onehot = jax.nn.one_hot(bin_id, 32, axis=0, dtype=diff.dtype)
        sel = jnp.einsum("bnj,bn->nj", diff, onehot)
        from refactored_orb_slam2_tpu.ops.descriptors import pack_bits
        return pack_bits((sel > 0).astype(jnp.uint8))

    jit_tail = jax.jit(desc_tail)
    print(f"    detect+desc full:        {tput(lambda: jit_tail(pyr)):7.2f} ms")

    # brief einsum alone at realistic sizes
    nkp = sum(quotas)
    P2 = orb_ops.PATCH * orb_ops.PATCH
    patches = jnp.zeros((nkp, P2), jnp.float32)
    Wsel = jnp.asarray(orb_ops._brief_selection_mats())
    jit_brief = jax.jit(lambda p: jnp.einsum(
        "nk,bkj->bnj", p, Wsel, preferred_element_type=jnp.float32))
    print(f"    BRIEF einsum (32 bins):  {tput(lambda: jit_brief(patches)):7.2f} ms")

    # slab gathers alone
    ys = jnp.full((nkp,), 100, jnp.int32)
    xs = jnp.full((nkp,), 100, jnp.int32)
    stack = jnp.zeros((4000, 640), jnp.float32)
    PR = orb_ops.PATCH_R
    PA = orb_ops.PATCH
    jit_slab = jax.jit(lambda s, y, x: jax.vmap(
        lambda yy, xx: jax.lax.dynamic_slice(s, (yy - PR, xx - PR), (PA, PA))
    )(y, x))
    print(f"    slab gather x1:          {tput(lambda: jit_slab(stack, ys, xs)):7.2f} ms")

    # --- tracking-side kernels --------------------------------------------
    frame = sys_._jit_frame(img, dep)
    jax.block_until_ready(frame)
    jit_mm = jax.jit(lambda pose: TK.match_motion_model(
        sys_.cam, pose, frame, last.xy, sys_.last_pt_idx, last.octave,
        m.pt_pos, m.pt_valid, m.pt_desc, last.angle,
        th=15.0, scale_factors=sys_.scale_factors, nn_max_dist=75))
    print(f"motion match:                {tput(lambda: jit_mm(sys_.last_pose)):7.2f} ms")

    inv_s2 = jnp.take(sys_.inv_sigma2_table,
                      jnp.clip(frame.octave, 0, cfg.orb.n_levels - 1))
    pt_idx = sys_.last_pt_idx
    valid = pt_idx >= 0
    pw = m.pt_pos[jnp.clip(pt_idx, 0)]
    is_st = frame.uvr[:, 2] >= 0
    print(f"pose opt (4x10 LM):          {tput(lambda: sys_._jit_pose_opt(sys_.cam, sys_.last_pose, pw, frame.uvr, inv_s2, valid, is_st)):7.2f} ms")

    P = m.pt_pos.shape[0]
    already = jnp.zeros(P, bool)
    jit_sel = jax.jit(lambda pose: TK.select_local_points(
        sys_.cam, pose, m.pt_pos, m.pt_valid, m.pt_normal,
        m.pt_min_dist, m.pt_max_dist, already, budget=4096,
        scale_factor=cfg.orb.scale_factor, n_levels=cfg.orb.n_levels))
    print(f"select local (top_k {P}): {tput(lambda: jit_sel(sys_.last_pose)):7.2f} ms")

    local = jit_sel(sys_.last_pose)
    jax.block_until_ready(local)
    jit_ml = jax.jit(lambda fr, lc: TK.match_local_points(
        fr, lc, m.pt_desc, pt_idx, th=1.0,
        scale_factors=sys_.scale_factors, use_pallas=sys_.use_pallas))
    print(f"match local (pallas={sys_.use_pallas}):   {tput(lambda: jit_ml(frame, local)):7.2f} ms")

    # visibility counters + kf stats are cheap scatters; remainder is glue
    print("(fused total minus stages = glue/2nd pose opt/stats)")


if __name__ == "__main__":
    main()
