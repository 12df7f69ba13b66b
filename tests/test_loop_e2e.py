"""Live loop-closure end-to-end test: drive a closed circuit through the
full SlamSystem (detection via the corpus-trained vocabulary, 3-consistency
chaining, Sim3, SearchAndFuse over the corrected group, LoopConnections,
essential graph, GBA) and assert the loop is found and the drift corrected.

The frames are rendered with the TRUE camera while the system tracks with a
slightly miscalibrated one (+4 px focal, ~1.2% — a realistic calibration
error).  Without it, stereo tracking on this circuit is so accurate that
the tracker re-matches the old landmarks at the revisit, the new keyframes
become covisible with the old ones, and loop *detection* is correctly
suppressed (candidates must not be connected, KeyFrameDatabase.cc:91-99) —
the reference behaves the same when there is nothing to correct.  The
miscalibration accumulates real metric drift around the circuit, so the
revisit exercises the genuine pipeline: BoW candidates over unconnected
keyframes -> consistency chain -> Sim3 -> correction -> GBA.
"""

import numpy as np
import pytest

from refactored_orb_slam2_tpu.system import SlamSystem
from refactored_orb_slam2_tpu.geometry.camera import Camera
from refactored_orb_slam2_tpu.utils.config import (
    CameraConfig, LoopConfig, MapConfig, ORBConfig, SystemConfig,
)
from refactored_orb_slam2_tpu.utils import world3d as W
from refactored_orb_slam2_tpu.utils.synthetic import ate_rmse


BLOCK, ROAD_W = 22.0, 8.0
DF = 4.0   # focal miscalibration (px) fed to the tracker


def make_cfg():
    return SystemConfig(
        sensor="stereo",
        camera=CameraConfig(
            fx=320.0 + DF, fy=320.0 + DF, cx=160.0, cy=120.0, bf=120.0,
            width=320, height=240, fps=10,
        ),
        # the reference's keyframe-decision thresholds are absolute counts
        # tuned for its 1000-2000 feature budgets (NeedNewKeyFrame's
        # 70/100 close-point bars, Tracking.cc:919); run the same budget
        orb=ORBConfig(n_features=1000, n_levels=4),
        map=MapConfig(
            # 24k points: the circuit builds ~16k landmarks, and a
            # saturated bank suspends triangulation exactly at the revisit
            # (fresh observations there feed the BoW consistency chain)
            max_keyframes=160, max_points=24576, max_obs_per_point=12,
            fuse_neighbors=4, triangulate_neighbors=4,
        ),
        loop=LoopConfig(),
    )


@pytest.mark.slow
class TestLoopClosureE2E:
    def test_street_circuit_closes_loop(self):
        cfg = make_cfg()
        cam_true = Camera.create(fx=320.0, fy=320.0, cx=160.0, cy=120.0,
                                 bf=120.0, width=320, height=240)
        world = W.scene_street(seed=41, block=BLOCK, road_w=ROAD_W)
        # 1.27 laps: the loop-consistency gate needs several keyframes past
        # the revisit point to chain 3 consistent detections (the chain is
        # rebuilt from scratch whenever a keyframe yields no candidates,
        # LoopClosing.cc:139-193)
        poses = W.traj_street_loop(
            140, block=BLOCK, road_w=ROAD_W, seed=41, laps=140 / 110.0
        )
        sys_ = SlamSystem(cfg)
        rng = np.random.default_rng(6)
        lost = 0
        for i, Tcw in enumerate(poses):
            L, R = world.render_stereo(Tcw, cam_true, noise=2.0, rng=rng)
            if sys_.track_stereo(L, R, i * 0.1) is None:
                lost += 1
        assert lost <= 2, f"lost {lost} frames on the circuit"
        # the loop must have been detected and corrected
        loop_edges = np.asarray(sys_.map.kf_loop_edges)
        assert (loop_edges >= 0).any(), "no loop edge was ever added"
        assert sys_.stats["gba_runs"] >= 1, "loop correction never ran GBA"
        # closed-circuit accuracy after correction
        gt = np.stack([
            -(T[:3, :3].T @ T[:3, 3]).astype(np.float32) for T in poses
        ])
        est = sys_.camera_centers()
        ate = ate_rmse(est, gt[sys_.tracked_frame_ids()])
        path = float(np.linalg.norm(np.diff(gt, axis=0), axis=1).sum())
        assert ate < 0.01 * path, f"ATE {ate:.3f} m over {path:.0f} m"


def _windowed_scale_drift(centers, gt_centers, w=15):
    """|log| scale mismatch across the loop seam: the second ``w``-keyframe
    window (early map, where the loop partner lives) vs the last window
    (the revisit keyframes).  Each window's scale is the Umeyama similarity
    scale of its estimated centres against ground truth; a scale-consistent
    map has the same scale in both (drift -> 0).

    The FIRST window is excluded on purpose: monocular initialization
    leaves a small scale transient in the first few keyframes (measured
    ~7% on this circuit, scripts/diag_mono_loop.py) that neither the
    essential graph nor GBA is supposed to remove — the loop correction's
    job is the seam between the revisit and the loop partner's
    neighbourhood."""

    def win_scale(E, G):
        E = E - E.mean(0)
        G = G - G.mean(0)
        C = G.T @ E / len(E)
        _, D, _ = np.linalg.svd(C)
        var_e = (E ** 2).sum() / len(E)
        return float(D.sum() / max(var_e, 1e-12))

    s0 = win_scale(centers[w:2 * w], gt_centers[w:2 * w])
    s1 = win_scale(centers[-w:], gt_centers[-w:])
    return abs(np.log(s1 / s0))


@pytest.mark.slow
class TestMonoSim3LoopE2E:
    """Monocular 7-DoF loop closure: the full fix_scale=False pipeline
    (detect -> Horn-with-scale -> SearchBySim3 -> projection gate ->
    7-DoF essential graph with scale correction -> GBA), asserting that
    real accumulated SCALE drift shrinks after the correction — the whole
    reason Sim3 exists (Optimizer.cc:763-1043 scale correction at
    1030-1042; LoopClosing.cc:217-373)."""

    def test_mono_circuit_corrects_scale_drift(self):
        cfg = SystemConfig(
            sensor="monocular",
            camera=CameraConfig(
                fx=320.0 + DF, fy=320.0 + DF, cx=160.0, cy=120.0, bf=120.0,
                width=320, height=240, fps=10,
            ),
            orb=ORBConfig(n_features=1000, n_levels=4),
            map=MapConfig(
                max_keyframes=160, max_points=16384, max_obs_per_point=12,
                fuse_neighbors=4, triangulate_neighbors=4,
            ),
            loop=LoopConfig(),
        )
        cam_true = Camera.create(fx=320.0, fy=320.0, cx=160.0, cy=120.0,
                                 bf=120.0, width=320, height=240)
        world = W.scene_street(seed=41, block=BLOCK, road_w=ROAD_W)
        n_frames = 150
        poses = W.traj_street_loop(
            n_frames, block=BLOCK, road_w=ROAD_W, seed=41,
            laps=n_frames / 110.0,
        )
        sys_ = SlamSystem(cfg)

        # snapshot the keyframe bank the moment before the loop correction
        # lands, so pre/post scale drift can be compared
        pre = {}
        orig_correct = sys_._correct_loop

        def snapping_correct(kf_cur, kf_loop, R_cm, t_cm, s_cm):
            if not pre:
                pre["kf_pose"] = np.asarray(sys_.map.kf_pose).copy()
                pre["kf_valid"] = np.asarray(sys_.map.kf_valid).copy()
                pre["kf_fid"] = np.asarray(sys_.map.kf_frame_id).copy()
                pre["s_cm"] = float(s_cm)
            return orig_correct(kf_cur, kf_loop, R_cm, t_cm, s_cm)

        sys_._correct_loop = snapping_correct

        rng = np.random.default_rng(6)
        lost = 0
        for i, Tcw in enumerate(poses):
            img = world.render(Tcw, cam_true, noise=2.0, rng=rng)
            if sys_.track_monocular(img, i * 0.1) is None:
                lost += 1
        # mono init burns the first few frames; the tracker must hold on
        # after that
        from refactored_orb_slam2_tpu.system import TrackState

        assert sys_.state == TrackState.OK, "mono tracking not OK at end"
        assert lost <= 12, f"lost {lost} frames on the mono circuit"

        loop_edges = np.asarray(sys_.map.kf_loop_edges)
        assert (loop_edges >= 0).any(), "no loop edge was ever added"
        assert pre, "_correct_loop never ran"
        assert sys_.stats["gba_runs"] >= 1, "loop correction never ran GBA"

        gt_centers_all = np.stack([
            -(T[:3, :3].T @ T[:3, 3]).astype(np.float32) for T in poses
        ])

        def kf_centers(kf_pose, kf_valid, kf_fid):
            sel = np.where(kf_valid)[0]
            sel = sel[np.argsort(kf_fid[sel])]
            cs = np.stack([
                -(kf_pose[k][:3, :3].T @ kf_pose[k][:3, 3]) for k in sel
            ])
            # frame ids are 1-based at the first track_* call
            gids = np.clip(kf_fid[sel] - 1, 0, len(gt_centers_all) - 1)
            return cs, gt_centers_all[gids]

        est_pre, gt_pre = kf_centers(pre["kf_pose"], pre["kf_valid"],
                                     pre["kf_fid"])
        est_post, gt_post = kf_centers(
            np.asarray(sys_.map.kf_pose), np.asarray(sys_.map.kf_valid),
            np.asarray(sys_.map.kf_frame_id),
        )
        drift_pre = _windowed_scale_drift(est_pre, gt_pre)
        drift_post = _windowed_scale_drift(est_post, gt_post)
        # the correction must have engaged the scale DoF and shrunk the
        # accumulated drift
        assert drift_pre > 0.01, (
            f"circuit accumulated no scale drift ({drift_pre:.4f}) — "
            "test scenario too easy to exercise Sim3"
        )
        assert drift_post < 0.6 * drift_pre, (
            f"scale drift did not shrink: {drift_pre:.4f} -> {drift_post:.4f} "
            f"(applied s_cm={pre['s_cm']:.4f})"
        )
        # trajectory accuracy after 7-DoF correction + GBA, scale-aligned
        from refactored_orb_slam2_tpu.utils.synthetic import ate_rmse_sim3

        ate = ate_rmse_sim3(est_post, gt_post)
        path = float(
            np.linalg.norm(np.diff(gt_centers_all, axis=0), axis=1).sum()
        )
        assert ate < 0.02 * path, f"mono ATE {ate:.3f} m over {path:.0f} m"
