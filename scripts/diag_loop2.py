"""Deep diagnostic: RPE per frame + fallback/reloc instrumentation on the
street circuit."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from refactored_orb_slam2_tpu.system import SlamSystem  # noqa: E402
from refactored_orb_slam2_tpu.utils.config import (  # noqa: E402
    CameraConfig, LoopConfig, MapConfig, ORBConfig, SystemConfig,
)
from refactored_orb_slam2_tpu.utils import world3d as W  # noqa: E402

BLOCK, ROAD_W = 22.0, 8.0
N_FRAMES = int(os.environ.get("DIAG_FRAMES", "45"))


def make_cfg():
    return SystemConfig(
        sensor="stereo",
        camera=CameraConfig(
            fx=320.0, fy=320.0, cx=160.0, cy=120.0, bf=120.0,
            width=320, height=240, fps=10,
        ),
        orb=ORBConfig(n_features=600, n_levels=4),
        map=MapConfig(
            max_keyframes=128, max_points=16384, max_obs_per_point=12,
            fuse_neighbors=4, triangulate_neighbors=4,
        ),
        loop=LoopConfig(),
    )


def main():
    cfg = make_cfg()
    world = W.scene_street(seed=41, block=BLOCK, road_w=ROAD_W)
    poses = W.traj_street_loop(110, block=BLOCK, road_w=ROAD_W, seed=41)[:N_FRAMES]
    sys_ = SlamSystem(cfg)
    rng = np.random.default_rng(6)

    # instrument the ref-KF fallback
    orig_ref = sys_._track_reference_keyframe

    def spy_ref(frame):
        res = sys_._jit_match_ref(
            frame,
            sys_.map.kf_desc[sys_.ref_kf],
            sys_.map.kf_point_idx[sys_.ref_kf],
            sys_.map.kf_feat_valid[sys_.ref_kf],
            sys_.map.kf_angle[sys_.ref_kf],
            sys_.map.pt_valid,
            nn_ratio=sys_.cfg.matcher.nn_ratio_ref_kf,
        )
        nm = int(res.n_matches)
        ok, pose, pt_idx = orig_ref(frame)
        ninl = "?"
        if nm >= sys_.cfg.tracking.min_matches_ref_kf:
            _, _, n_inl = sys_._pose_opt_against_map(
                frame, sys_.last_pose, res.pt_idx)
            ninl = int(n_inl)
        print(f"    [refKF] ref={sys_.ref_kf} matches={nm} inl={ninl} ok={ok}",
              flush=True)
        return ok, pose, pt_idx

    sys_._track_reference_keyframe = spy_ref

    orig_reloc = sys_._relocalize

    def spy_reloc(frame):
        from refactored_orb_slam2_tpu.place.keyframe_db import detect_reloc_candidates
        bow = sys_.db.signature_of(frame.desc, frame.valid)
        covis = sys_._jit_covis(sys_.map)
        cands, scores = detect_reloc_candidates(sys_.db, bow, covis)
        print(f"    [reloc] cands={np.asarray(cands)} scores={np.asarray(scores)[:6]}",
              flush=True)
        ok = orig_reloc(frame)
        print(f"    [reloc] -> ok={ok[0]}", flush=True)
        return ok

    sys_._relocalize = spy_reloc

    prev_est = None
    prev_gt = None
    lost = 0
    for i, Tcw in enumerate(poses):
        L, R = world.render_stereo(Tcw, sys_.cam, noise=2.0, rng=rng)
        nkf0 = sys_.n_kf
        pose = sys_.track_stereo(L, R, i * 0.1)
        ok = pose is not None
        if not ok:
            lost += 1
        msg = f"f{i:3d} ok={int(ok)} kf={sys_.n_kf}{'+' if sys_.n_kf>nkf0 else ' '} pt={sys_.n_pt}"
        if ok and prev_est is not None:
            rel_est = pose @ np.linalg.inv(prev_est)
            rel_gt = (Tcw @ np.linalg.inv(prev_gt)).astype(np.float32)
            dR = rel_est[:3, :3] @ rel_gt[:3, :3].T
            ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
            dt = np.linalg.norm(rel_est[:3, 3] - rel_gt[:3, 3])
            t_est = np.linalg.norm(rel_est[:3, 3])
            t_gt = np.linalg.norm(rel_gt[:3, 3])
            msg += (f" rpe_rot={ang:5.2f}deg rpe_t={dt:.3f}m "
                    f"|t|est={t_est:.3f} |t|gt={t_gt:.3f}")
        print(msg, flush=True)
        if ok:
            prev_est, prev_gt = pose, Tcw
        else:
            prev_est = None
    print(f"\nlost={lost} stats={sys_.stats}")


if __name__ == "__main__":
    main()
