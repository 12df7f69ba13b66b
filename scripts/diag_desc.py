"""Probe descriptor stability across yaw: extract ORB on two circuit frames,
pair features by ground-truth projection (known pose+depth), and report the
Hamming distance distribution of true correspondences plus what each matcher
gate would pass."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from refactored_orb_slam2_tpu.frontend.frame import build_frame_stereo  # noqa: E402
from refactored_orb_slam2_tpu.geometry.camera import Camera  # noqa: E402
from refactored_orb_slam2_tpu.utils.config import (  # noqa: E402
    CameraConfig, ORBConfig, camera_from_config,
)
from refactored_orb_slam2_tpu.utils import world3d as W  # noqa: E402
from refactored_orb_slam2_tpu.ops.descriptors import hamming  # noqa: E402

BLOCK, ROAD_W = 22.0, 8.0

cam_cfg = CameraConfig(fx=320.0, fy=320.0, cx=160.0, cy=120.0, bf=120.0,
                       width=320, height=240, fps=10)
orb_cfg = ORBConfig(n_features=600, n_levels=4)
cam = camera_from_config(cam_cfg)

world = W.scene_street(seed=41, block=BLOCK, road_w=ROAD_W)
poses = W.traj_street_loop(110, block=BLOCK, road_w=ROAD_W, seed=41)

rng = np.random.default_rng(6)


def get_frame(i):
    L, R = world.render_stereo(poses[i], cam, noise=2.0, rng=rng)
    f = jax.jit(lambda a, b: build_frame_stereo(a, b, cam, orb_cfg))(
        jnp.asarray(L), jnp.asarray(R))
    return f


def analyze(ia, ib):
    fa, fb = get_frame(ia), get_frame(ib)
    va = np.asarray(fa.valid)
    vb = np.asarray(fb.valid)
    da = np.asarray(fa.depth)
    xya = np.asarray(fa.xy)
    xyb = np.asarray(fb.xy)
    # unproject frame-a features with depth, reproject into frame b via GT
    Ta, Tb = poses[ia], poses[ib]
    T_ba = (Tb @ np.linalg.inv(Ta)).astype(np.float32)
    has = va & (da > 0)
    z = np.where(has, da, 1.0)
    pc = np.stack([(xya[:, 0] - cam.cx) / cam.fx * z,
                   (xya[:, 1] - cam.cy) / cam.fy * z, z], -1)
    pb = pc @ T_ba[:3, :3].T + T_ba[:3, 3]
    zb = pb[:, 2]
    ub = cam.fx * pb[:, 0] / np.maximum(zb, 1e-6) + cam.cx
    vb_ = cam.fy * pb[:, 1] / np.maximum(zb, 1e-6) + cam.cy
    in_img = has & (zb > 0) & (ub >= 0) & (ub < cam.width) & (vb_ >= 0) & (vb_ < cam.height)
    # nearest extracted feature in b within 3 px and same octave
    octa = np.asarray(fa.octave)
    octb = np.asarray(fb.octave)
    dists_gt = []
    angs = []
    n_pairs = 0
    D = np.asarray(hamming(fa.desc, fb.desc))
    for i in np.where(in_img)[0]:
        d2 = (xyb[:, 0] - ub[i]) ** 2 + (xyb[:, 1] - vb_[i]) ** 2
        cand = np.where(vb & (d2 < 9.0) & (octb == octa[i]))[0]
        if len(cand) == 0:
            continue
        j = cand[np.argmin(d2[cand])]
        n_pairs += 1
        dists_gt.append(D[i, j])
        ra = np.asarray(fa.angle)[i] - np.asarray(fb.angle)[j]
        angs.append(ra % 360.0)
    dists_gt = np.asarray(dists_gt)
    angs = np.asarray(angs)
    print(f"frames {ia}->{ib}: {int(in_img.sum())} projectable, "
          f"{n_pairs} GT pairs (re-detected within 3px same octave)")
    if n_pairs:
        print(f"  hamming of GT pairs: median={np.median(dists_gt):.0f} "
              f"p25={np.percentile(dists_gt,25):.0f} p75={np.percentile(dists_gt,75):.0f} "
              f"<=50: {(dists_gt<=50).mean()*100:.0f}%  <=75: {(dists_gt<=75).mean()*100:.0f}%")
        print(f"  angle diff: median={np.median(angs):.1f} deg  "
              f"p10={np.percentile(angs,10):.1f} p90={np.percentile(angs,90):.1f}")
    # what would global mutual NN at various gates find?
    from refactored_orb_slam2_tpu.ops import matching as M
    for ratio, md in ((0.7, 50), (0.75, 75), (0.9, 75), (1.0, 100)):
        res = M.nn_match(jnp.asarray(D), row_valid=fa.valid, col_valid=fb.valid,
                         max_dist=md, ratio=ratio, mutual=True)
        keep = M.rotation_consistency_mask(fa.angle, fb.angle, res)
        print(f"  global mutual NN ratio={ratio} max={md}: "
              f"{int(res.mask.sum())} matches, {int(keep.sum())} after rot-hist")


for (a, b) in ((24, 25), (25, 26), (25, 27), (20, 26), (15, 26)):
    analyze(a, b)


def analyze2(ia, ib):
    """Condition hamming distance on angle agreement."""
    fa, fb = get_frame(ia), get_frame(ib)
    va = np.asarray(fa.valid); vb = np.asarray(fb.valid)
    da = np.asarray(fa.depth); xya = np.asarray(fa.xy); xyb = np.asarray(fb.xy)
    Ta, Tb = poses[ia], poses[ib]
    T_ba = (Tb @ np.linalg.inv(Ta)).astype(np.float32)
    has = va & (da > 0)
    z = np.where(has, da, 1.0)
    pc = np.stack([(xya[:, 0] - cam.cx) / cam.fx * z,
                   (xya[:, 1] - cam.cy) / cam.fy * z, z], -1)
    pb = pc @ T_ba[:3, :3].T + T_ba[:3, 3]
    zb = pb[:, 2]
    ub = cam.fx * pb[:, 0] / np.maximum(zb, 1e-6) + cam.cx
    vb_ = cam.fy * pb[:, 1] / np.maximum(zb, 1e-6) + cam.cy
    in_img = has & (zb > 0) & (ub >= 0) & (ub < cam.width) & (vb_ >= 0) & (vb_ < cam.height)
    octa = np.asarray(fa.octave); octb = np.asarray(fb.octave)
    D = np.asarray(hamming(fa.desc, fb.desc))
    rows = []
    for i in np.where(in_img)[0]:
        d2 = (xyb[:, 0] - ub[i]) ** 2 + (xyb[:, 1] - vb_[i]) ** 2
        cand = np.where(vb & (d2 < 9.0) & (octb == octa[i]))[0]
        if len(cand) == 0:
            continue
        j = cand[np.argmin(d2[cand])]
        ad = (np.asarray(fa.angle)[i] - np.asarray(fb.angle)[j]) % 360.0
        ad = min(ad, 360 - ad)
        rows.append((ad, D[i, j]))
    rows = np.asarray(rows)
    if not len(rows):
        print(f"frames {ia}->{ib}: no pairs"); return
    agree = rows[rows[:, 0] < 12]
    disagree = rows[rows[:, 0] >= 12]
    print(f"frames {ia}->{ib}: {len(rows)} pairs; angle<12deg: {len(agree)} "
          f"(med ham {np.median(agree[:,1]) if len(agree) else -1:.0f}); "
          f"angle>=12deg: {len(disagree)} (med ham {np.median(disagree[:,1]) if len(disagree) else -1:.0f})")


def same_pose_angle_stability(i):
    """Same pose, two different noise draws."""
    rngA = np.random.default_rng(100)
    rngB = np.random.default_rng(200)
    L1, R1 = world.render_stereo(poses[i], cam, noise=2.0, rng=rngA)
    L2, R2 = world.render_stereo(poses[i], cam, noise=2.0, rng=rngB)
    jf = jax.jit(lambda a, b: build_frame_stereo(a, b, cam, orb_cfg))
    f1, f2 = jf(jnp.asarray(L1), jnp.asarray(R1)), jf(jnp.asarray(L2), jnp.asarray(R2))
    xy1, xy2 = np.asarray(f1.xy), np.asarray(f2.xy)
    o1, o2 = np.asarray(f1.octave), np.asarray(f2.octave)
    v1, v2 = np.asarray(f1.valid), np.asarray(f2.valid)
    a1, a2 = np.asarray(f1.angle), np.asarray(f2.angle)
    D = np.asarray(hamming(f1.desc, f2.desc))
    ads, hds = [], []
    for i_ in np.where(v1)[0]:
        d2 = (xy2[:, 0] - xy1[i_, 0]) ** 2 + (xy2[:, 1] - xy1[i_, 1]) ** 2
        cand = np.where(v2 & (d2 < 2.0) & (o2 == o1[i_]))[0]
        if len(cand) == 0:
            continue
        j = cand[np.argmin(d2[cand])]
        ad = (a1[i_] - a2[j]) % 360.0
        ads.append(min(ad, 360 - ad)); hds.append(D[i_, j])
    ads = np.asarray(ads); hds = np.asarray(hds)
    print(f"same-pose f{i} noise-only: {len(ads)} pairs, angle diff med={np.median(ads):.1f} "
          f"p90={np.percentile(ads,90):.1f}; ham med={np.median(hds):.0f} p90={np.percentile(hds,90):.0f}")


print("\n--- conditioned on angle agreement ---")
analyze2(24, 25)
analyze2(25, 26)
print("\n--- same-pose noise-only stability ---")
same_pose_angle_stability(24)
